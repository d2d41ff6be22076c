"""Integration tests: AutoModel + the CLI drivers over a real on-disk HF
checkpoint (tiny random llama saved via transformers)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_llama")
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(str(d), safe_serialization=True)
    return str(d)


def run_cli(script, *args, env_extra=None):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    if env_extra:
        env.update(env_extra)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


class TestAutoModel:
    def test_from_pretrained_fp16(self, hf_dir):
        from mixq_tpu.models.auto import AutoModel
        params, cfg, specs = AutoModel.from_pretrained(hf_dir)
        assert cfg.model_type == "llama"
        assert specs.wqkv.version == "FP16"

    def test_from_pretrained_quantized(self, hf_dir):
        from mixq_tpu.config import QuantConfig
        from mixq_tpu.models.auto import AutoModel
        params, cfg, specs = AutoModel.from_pretrained(
            hf_dir, quant_config=QuantConfig.w8a8(outlier_budget=8))
        assert params.blocks[0].attn.wq.q_weight.dtype.name == "int8"

    def test_engine_generates(self, hf_dir):
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.models.auto import AutoModel
        engine = AutoModel.engine(
            hf_dir, EngineConfig(max_seq_len=64, prefill_chunk=8))
        out = engine.generate([[1, 2, 3]], max_new_tokens=4)
        assert len(out[0]) == 4


class TestCLIs:
    def test_quant_then_ppl_then_flops(self, hf_dir, tmp_path):
        qdir = str(tmp_path / "quant")
        run_cli("examples/basic_quant_mix.py",
                "--model_path", hf_dir, "--quant_file", qdir, "--w_bit", "8")
        assert os.path.exists(os.path.join(qdir, "manifest.json"))

        tokens = np.random.RandomState(0).randint(0, 256, 2048).astype(np.int32)
        tok_file = str(tmp_path / "tokens.npy")
        np.save(tok_file, tokens)

        out = run_cli("evalppl.py", "--model_path", qdir,
                      "--eval_tokens", tok_file, "--n_ctx", "64",
                      "--batch", "4", "--max_windows", "4")
        row = json.loads(out.strip().splitlines()[-1])
        assert row["ppl"] > 0 and row["windows"] == 4

        out = run_cli("benchflops.py", "--model_path", qdir,
                      "--batch_sizes", "2", "--prompt_len", "4",
                      "--n_generate", "4", "--kv_dtype", "bfloat16")
        row = json.loads(out.strip().splitlines()[-1])
        assert row["tokens_per_s"] > 0

    def test_act_scales_cli(self, hf_dir, tmp_path):
        tokens = np.random.RandomState(1).randint(0, 256, 4096).astype(np.int32)
        tok_file = str(tmp_path / "cal.npy")
        np.save(tok_file, tokens)
        out_file = str(tmp_path / "scales.npz")
        run_cli("examples/get_act_scales.py", "--model_path", hf_dir,
                "--output", out_file, "--calib_tokens", tok_file,
                "--calib_samples", "2")
        with np.load(out_file) as f:
            assert len(f.files) == 8  # 2 layers x 4 groups

    def test_serve_cb_cli(self, hf_dir, tmp_path):
        """The serving driver drains a JSONL request file through the
        slot pool (no tokenizer: prompt_ids mode) and emits one JSON
        line per completion."""
        reqs = tmp_path / "reqs.jsonl"
        reqs.write_text("\n".join([
            json.dumps({"prompt_ids": [1, 2, 3], "max_new_tokens": 5}),
            json.dumps({"prompt_ids": [7], "max_new_tokens": 3,
                        "temperature": 0.8, "top_k": 8}),
            json.dumps({"prompt_ids": [4, 5], "max_new_tokens": 4}),
        ]))
        out = run_cli("examples/serve_cb.py", "--model_path", hf_dir,
                      "--requests", str(reqs), "--slots", "2",
                      "--max_seq", "32")
        rows = [json.loads(l) for l in out.strip().splitlines()]
        assert sorted(r["id"] for r in rows) == [0, 1, 2]
        assert {r["id"]: r["tokens"] for r in rows} == {0: 5, 1: 3, 2: 4}
        assert all(len(r["token_ids"]) == r["tokens"] for r in rows)

    def test_quant_w4_with_calib(self, hf_dir, tmp_path):
        qdir = str(tmp_path / "quant4")
        tokens = np.random.RandomState(2).randint(0, 256, 4096).astype(np.int32)
        tok_file = str(tmp_path / "cal4.npy")
        np.save(tok_file, tokens)
        run_cli("examples/basic_quant_mix.py",
                "--model_path", hf_dir, "--quant_file", qdir,
                "--w_bit", "4", "--outlier_budget", "8",
                "--calib_tokens", tok_file, "--calib_samples", "2")
        with open(os.path.join(qdir, "quant_config.json")) as f:
            assert json.load(f)["w_bit"] == 4


class TestBenchLatency:
    def test_latency_percentiles(self, tmp_path):
        """benchlatency emits TTFT + per-step percentiles (reference
        benchlatency.py equivalent; round-1 version was a 14-line alias)."""
        csv_path = str(tmp_path / "lat.csv")
        out = run_cli("benchlatency.py", env_extra={
            "BENCH_PRESET": "tiny", "BENCH_BATCH": "2", "BENCH_SEQ": "32",
            "BENCH_PROMPT": "8", "BENCH_DECODE_STEPS": "8",
            "BENCH_W": "16", "BENCH_CSV": csv_path})
        row = json.loads(out.strip().splitlines()[-1])
        dec = row["decode_ms"]
        assert dec["p50"] <= dec["p95"] <= dec["p99"] <= dec["max"]
        assert row["ttft_ms"] >= 0
        with open(csv_path) as f:
            header = f.readline()
            assert "decode_p99_ms" in header


class TestEvalCalibLeakGuard:
    def test_eval_calibration_refused(self, hf_dir, tmp_path):
        """Quantizing at eval time on the eval stream is refused unless
        explicitly allowed (reference calibrates on Pile, never the eval
        set — utils/calib_data.py:6-45)."""
        tokens = np.random.RandomState(3).randint(0, 256, 2048).astype(np.int32)
        tok_file = str(tmp_path / "ev.npy")
        np.save(tok_file, tokens)
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "evalppl.py"),
             "--model_path", hf_dir, "--model_type", "mix4",
             "--eval_tokens", tok_file, "--n_ctx", "64", "--batch", "2",
             "--max_windows", "2"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert r.returncode != 0
        assert "calib" in (r.stderr + r.stdout).lower()

    def test_separate_calib_tokens_accepted(self, hf_dir, tmp_path):
        tokens = np.random.RandomState(4).randint(0, 256, 2048).astype(np.int32)
        ev = str(tmp_path / "ev2.npy"); np.save(ev, tokens)
        cal = str(tmp_path / "cal2.npy")
        np.save(cal, np.random.RandomState(5).randint(0, 256, 4096).astype(np.int32))
        out = run_cli("evalppl.py", "--model_path", hf_dir,
                      "--model_type", "mix4", "--eval_tokens", ev,
                      "--calib_tokens", cal, "--n_ctx", "64", "--batch", "2",
                      "--max_windows", "2")
        row = json.loads(out.strip().splitlines()[-1])
        assert row["ppl"] > 0
