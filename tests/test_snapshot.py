"""Engine-state snapshot/restore (failure recovery — SURVEY §5): a pool
snapshotted between windows and restored into a fresh engine must continue
EXACTLY where it stopped: greedy rows bit-identical, sampled rows
reproducible (the PRNG key is state), queued requests preserved in order,
slot ids preserved (KV rows are slot-indexed)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.engine.sampling import SamplingParams
from mixq_tpu.engine.scheduler import PythonScheduler, make_scheduler
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, DecoderSpecs.fp16()


PROMPTS = [[3, 1, 4, 1, 5], [2, 7], [9, 9, 8, 2, 1, 8], [6, 2, 8], [1, 7]]


def _ecfg(**kw):
    kw.setdefault("max_batch_size", 3)   # fewer slots than requests:
    kw.setdefault("max_seq_len", 64)     # the snapshot carries a queue
    kw.setdefault("prefill_chunk", 8)
    return EngineConfig(**kw)


def _serve(eng, ids, windows_before_snap=None, snap_path=None, model=None,
           ecfg=None, **restore_kw):
    """Run to completion, optionally snapshotting + restoring mid-flight."""
    done = {}
    w = 0
    while eng.has_work:
        eng.step_window()
        done.update(eng.finished())
        w += 1
        if windows_before_snap is not None and w == windows_before_snap:
            eng.snapshot(snap_path)
            params, cfg, specs = model
            eng = ContinuousBatchingEngine.restore(
                snap_path, params, cfg, specs, ecfg, **restore_kw)
            windows_before_snap = None
        assert w < 500
    done.update(eng.finished())
    return [done[i] for i in ids]


class TestSnapshotRestore:
    def test_scheduler_restore_slot_parity(self):
        a = make_scheduler(4, 32, prefer_native=True)
        b = PythonScheduler(4, 32)
        for s in (a, b):
            assert s.restore_slot(2, 77, 5, 10, 3) == 0
            assert s.restore_slot(2, 78, 5, 10, 3) == -1   # occupied
            assert s.restore_slot(1, 79, 5, 10, 12) == -2  # done already
        assert a.slot_info(2) == b.slot_info(2) == (77, 5, 3, 10)
        assert a.stats() == b.stats()

    def test_greedy_continuation_matches_uninterrupted(self, model, tmp_path):
        params, cfg, specs = model
        ecfg = _ecfg()

        ref_eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        ref_ids = [ref_eng.add_request(p, 7) for p in PROMPTS]
        ref = _serve(ref_eng, ref_ids)

        eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        ids = [eng.add_request(p, 7) for p in PROMPTS]
        got = _serve(eng, ids, windows_before_snap=1,
                     snap_path=str(tmp_path / "snap"), model=model,
                     ecfg=ecfg)
        assert got == ref

    def test_sampled_rows_reproducible(self, model, tmp_path):
        params, cfg, specs = model
        ecfg = _ecfg()
        sp = SamplingParams(temperature=0.8, top_k=8)

        def run(snap_at=None):
            eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
            ids = [eng.add_request(p, 6, sampling=sp) for p in PROMPTS[:3]]
            return _serve(eng, ids, windows_before_snap=snap_at,
                          snap_path=str(tmp_path / "snap_s"), model=model,
                          ecfg=ecfg)

        assert run(None) == run(2)

    def test_int8_flash_pool_roundtrip(self, model, tmp_path):
        params, cfg, specs = model
        specs = dataclasses.replace(specs, attn_impl="flash")
        ecfg = _ecfg(kv_dtype="int8")
        ref_eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        ref_ids = [ref_eng.add_request(p, 6) for p in PROMPTS[:4]]
        ref = _serve(ref_eng, ref_ids)

        eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        assert eng.cache.head_major and eng.cache.k_tail is not None
        ids = [eng.add_request(p, 6) for p in PROMPTS[:4]]
        got = _serve(eng, ids, windows_before_snap=1,
                     snap_path=str(tmp_path / "snap8"),
                     model=(params, cfg, specs), ecfg=ecfg)
        assert got == ref

    def test_spec_engine_roundtrip(self, model, tmp_path):
        params, cfg, specs = model
        ecfg = _ecfg(spec_k=3, max_batch_size=2)
        prompts = [[5, 3, 5, 3, 5, 3, 5], [2, 7, 2, 7, 2, 7]]

        def run(snap_at=None):
            eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
            ids = [eng.add_request(p, 8) for p in prompts]
            done = {}
            w = 0
            while eng.has_work:
                eng.step_serve()
                done.update(eng.finished())
                w += 1
                if snap_at is not None and w == snap_at:
                    eng.snapshot(str(tmp_path / "snap_spec"))
                    eng = ContinuousBatchingEngine.restore(
                        str(tmp_path / "snap_spec"), params, cfg, specs,
                        ecfg)
                    snap_at = None
                assert w < 500
            done.update(eng.finished())
            return [done[i] for i in ids]

        assert run(None) == run(1)
