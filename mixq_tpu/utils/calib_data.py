"""Calibration data loading (reference utils/calib_data.py:6-45).

The reference pulls `mit-han-lab/pile-val-backup` from the HF hub; this
environment is offline, so data comes from a local text file / pre-tokenized
array, with the same shaping: concat samples -> fixed-length token blocks.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def blocks_from_tokens(
    token_ids: np.ndarray, n_samples: int = 64, block_len: int = 512,
) -> List[np.ndarray]:
    """Cut a token stream into [1, block_len] calibration batches
    (reference calib_data.py:30-44: concat then split into 512-token blocks)."""
    token_ids = np.asarray(token_ids, np.int32).reshape(-1)
    n = min(n_samples, len(token_ids) // block_len)
    if n == 0:
        raise ValueError(
            f"need >= {block_len} tokens for calibration, got {len(token_ids)}")
    return [token_ids[i * block_len:(i + 1) * block_len][None, :]
            for i in range(n)]


def get_calib_dataset(
    text_path: Optional[str] = None,
    tokenizer=None,
    tokens_path: Optional[str] = None,
    n_samples: int = 64,
    block_len: int = 512,
    vocab_size: Optional[int] = None,
    seed: int = 0,
) -> List[np.ndarray]:
    """Calibration batches from (in priority order): a pre-tokenized .npy,
    a text file + tokenizer, or synthetic random tokens (tests/smoke)."""
    if tokens_path:
        return blocks_from_tokens(np.load(tokens_path), n_samples, block_len)
    if text_path:
        assert tokenizer is not None, "text calibration needs a tokenizer"
        with open(text_path, errors="ignore") as f:
            text = f.read()
        ids = np.asarray(tokenizer(text).input_ids, np.int32)
        return blocks_from_tokens(ids, n_samples, block_len)
    assert vocab_size is not None, "synthetic calibration needs vocab_size"
    rng = np.random.RandomState(seed)
    return [rng.randint(0, vocab_size, (1, block_len)).astype(np.int32)
            for _ in range(n_samples)]
