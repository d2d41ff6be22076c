"""MMLU evaluation harness (reference examples/mmlu.py:162-214,519-662).

Hendrycks-format data: <data_dir>/{dev,test}/<subject>_{dev,test}.csv with
rows [question, A, B, C, D, answer]. Few-shot prompts are built exactly like
the reference (:162-214); scoring asks the model for logits at the final
position and picks argmax over the four answer-letter tokens (equivalent to
the reference's 2-token greedy generate + parse, but single-forward and
unambiguous).
"""
from __future__ import annotations

import csv
import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import ModelConfig
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache

CHOICES = ["A", "B", "C", "D"]


def _format_subject(subject: str) -> str:
    return subject.replace("_", " ")


def format_example(row: Sequence[str], include_answer: bool = True) -> str:
    """One Q/A block (reference mmlu.py:162-178)."""
    prompt = row[0]
    for j, ch in enumerate(CHOICES):
        prompt += f"\n{ch}. {row[j + 1]}"
    prompt += "\nAnswer:"
    if include_answer:
        prompt += f" {row[5]}\n\n"
    return prompt


def gen_prompt(dev_rows: List[Sequence[str]], subject: str, k: int) -> str:
    """Few-shot header (reference mmlu.py:180-190)."""
    p = (f"The following are multiple choice questions (with answers) about "
         f"{_format_subject(subject)}.\n\n")
    for row in dev_rows[:k]:
        p += format_example(row, include_answer=True)
    return p


def _read_csv(path: str) -> List[List[str]]:
    with open(path, newline="", encoding="utf-8") as f:
        return [row for row in csv.reader(f)]


@dataclasses.dataclass
class MMLUResult:
    accuracy: float
    per_subject: Dict[str, float]
    n_questions: int


def evaluate_mmlu(
    params: DecoderParams,
    cfg: ModelConfig,
    specs: DecoderSpecs,
    tokenizer,
    data_dir: str,
    n_shot: int = 5,
    max_subjects: Optional[int] = None,
    max_questions_per_subject: Optional[int] = None,
    max_seq: int = 2048,
    kv_dtype=jnp.bfloat16,
) -> MMLUResult:
    test_dir = os.path.join(data_dir, "test")
    dev_dir = os.path.join(data_dir, "dev")
    subjects = sorted(
        f[: -len("_test.csv")] for f in os.listdir(test_dir)
        if f.endswith("_test.csv"))
    if max_subjects:
        subjects = subjects[:max_subjects]

    # token ids of " A" ... " D" (last token)
    choice_ids = [tokenizer(f" {c}", add_special_tokens=False).input_ids[-1]
                  for c in CHOICES]
    choice_ids = jnp.asarray(choice_ids, jnp.int32)

    fwd = jax.jit(
        lambda p, t, c, s: forward(p, t, c, specs, cfg, kv_start=s),
        static_argnames=())

    def score_batch(prompt_ids: List[List[int]]) -> np.ndarray:
        B = len(prompt_ids)
        Tp = max(len(p) for p in prompt_ids)
        toks = np.zeros((B, Tp), np.int32)
        start = np.zeros((B,), np.int32)
        for i, p in enumerate(prompt_ids):
            toks[i, Tp - len(p):] = p
            start[i] = Tp - len(p)
        cache = KVCache.create(cfg.num_hidden_layers, B, Tp,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               kv_dtype)
        logits, _ = fwd(params, jnp.asarray(toks), cache, jnp.asarray(start))
        last = logits[:, -1, :]
        picks = jnp.argmax(last[:, choice_ids], axis=-1)
        return np.asarray(picks)

    per_subject: Dict[str, float] = {}
    total_correct, total_n = 0, 0
    for subject in subjects:
        dev_rows = _read_csv(os.path.join(dev_dir, f"{subject}_dev.csv"))
        test_rows = _read_csv(os.path.join(test_dir, f"{subject}_test.csv"))
        if max_questions_per_subject:
            test_rows = test_rows[:max_questions_per_subject]

        header = gen_prompt(dev_rows, subject, n_shot)
        prompt_ids, answers = [], []
        for row in test_rows:
            text = header + format_example(row, include_answer=False)
            ids = tokenizer(text).input_ids
            # shrink shots if over budget (reference mmlu.py:196-203)
            k = n_shot
            while len(ids) > max_seq - 8 and k > 0:
                k -= 1
                ids = tokenizer(
                    gen_prompt(dev_rows, subject, k)
                    + format_example(row, include_answer=False)).input_ids
            prompt_ids.append(ids[-(max_seq - 8):])
            answers.append(CHOICES.index(row[5].strip()))

        correct = 0
        BS = 8
        for i in range(0, len(prompt_ids), BS):
            picks = score_batch(prompt_ids[i:i + BS])
            correct += int(np.sum(picks == np.asarray(answers[i:i + BS])))
        per_subject[subject] = correct / max(len(test_rows), 1)
        total_correct += correct
        total_n += len(test_rows)

    return MMLUResult(
        accuracy=total_correct / max(total_n, 1),
        per_subject=per_subject,
        n_questions=total_n,
    )
