"""MMLU harness tests with synthetic Hendrycks-format data."""
import csv
import os

import jax
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.eval.mmlu import MMLUResult, evaluate_mmlu, format_example, gen_prompt
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params


class FakeTokenizer:
    """Char-level tokenizer over a tiny vocab (deterministic, offline)."""

    def __init__(self, vocab_size=256):
        self.vocab_size = vocab_size

    def __call__(self, text, add_special_tokens=True):
        ids = [min(ord(c), self.vocab_size - 1) for c in text]

        class R:
            input_ids = ids
        return R()


@pytest.fixture()
def data_dir(tmp_path):
    for split, n in (("dev", 5), ("test", 6)):
        d = tmp_path / split
        d.mkdir()
        for subject in ("algebra", "biology"):
            with open(d / f"{subject}_{split}.csv", "w", newline="") as f:
                w = csv.writer(f)
                for i in range(n):
                    w.writerow([f"Question {i}?", "one", "two", "three",
                                "four", "ABCD"[i % 4]])
    return str(tmp_path)


class TestPromptBuild:
    def test_format_example(self):
        row = ["Q?", "a1", "a2", "a3", "a4", "B"]
        s = format_example(row)
        assert "Q?" in s and "\nB. a2" in s and s.endswith("Answer: B\n\n")

    def test_gen_prompt_shots(self):
        rows = [["Q%d" % i, "a", "b", "c", "d", "A"] for i in range(5)]
        p2 = gen_prompt(rows, "abstract_algebra", 2)
        assert p2.count("Answer:") == 2
        assert "abstract algebra" in p2


class TestEvaluate:
    def test_runs_and_aggregates(self, data_dir):
        cfg = ModelConfig.tiny(max_position_embeddings=2048)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        tok = FakeTokenizer(cfg.vocab_size)
        r = evaluate_mmlu(params, cfg, DecoderSpecs.fp16(), tok, data_dir,
                          n_shot=2, max_seq=1024)
        assert isinstance(r, MMLUResult)
        assert r.n_questions == 12
        assert set(r.per_subject) == {"algebra", "biology"}
        assert 0.0 <= r.accuracy <= 1.0

    def test_max_limits(self, data_dir):
        cfg = ModelConfig.tiny(max_position_embeddings=2048)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        tok = FakeTokenizer(cfg.vocab_size)
        r = evaluate_mmlu(params, cfg, DecoderSpecs.fp16(), tok, data_dir,
                          n_shot=1, max_subjects=1,
                          max_questions_per_subject=3, max_seq=1024)
        assert r.n_questions == 3
