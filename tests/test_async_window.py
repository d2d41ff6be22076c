"""Lag-1 async decode windows (step_window_async) must be behaviorally
identical to the synchronous window path: same greedy tokens, same EOS
truncation, same discard-after-finish and boundary-admission semantics.
The async path exists to hide the per-window fetch round-trip (relay
RTT) behind the next window's device time — it may change WHEN results
are observed (one window late), never WHAT they are."""
import jax
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, DecoderSpecs.fp16()


PROMPTS = [[3, 1, 4, 1, 5], [2, 7], [9], [8, 2, 8, 1], [6, 6, 1]]


def make_engine(model, async_windows, n_slots=2, window_r=0, **kw):
    params, cfg, specs = model
    return ContinuousBatchingEngine(
        params, cfg, specs,
        EngineConfig(max_batch_size=n_slots, max_seq_len=64,
                     prefill_chunk=8, async_windows=async_windows,
                     window_r=window_r, **kw))


def run_engine(model, async_windows, prompts=PROMPTS, new=11, eos=None,
               n_slots=2, window_r=0, **kw):
    eng = make_engine(model, async_windows, n_slots, window_r, **kw)
    ids = [eng.add_request(p, new) for p in prompts]
    out = eng.run_to_completion(eos_token_id=eos)
    return [out[r] for r in ids]


class TestAsyncWindow:
    def test_matches_sync_greedy(self, model):
        """Token equality vs the sync window path, including slot reuse
        (5 requests through 2 slots — a finished slot's stale in-flight
        tokens must never leak into its next occupant)."""
        got = run_engine(model, async_windows=True)
        ref = run_engine(model, async_windows=False)
        assert got == ref

    def test_eos_truncates(self, model):
        ref = run_engine(model, async_windows=False)
        eos = ref[0][4]
        got = run_engine(model, async_windows=True, eos=eos)
        exp = run_engine(model, async_windows=False, eos=eos)
        assert got == exp
        assert got[0][-1] == eos and len(got[0]) <= 11

    def test_staggered_admission(self, model):
        """Admissions mid-run exercise the use_ov override splice: a slot
        rewritten by admission since the last dispatch takes host values,
        every other slot takes the device carry."""
        def run(async_windows):
            eng = make_engine(model, async_windows, n_slots=4)
            ids = [eng.add_request(p, 9) for p in PROMPTS[:2]]
            for _ in range(2):
                (eng.step_window_async if async_windows
                 else eng.step_window)()
            ids += [eng.add_request(p, 9) for p in PROMPTS[2:]]
            out = eng.run_to_completion()
            return [out[r] for r in ids]

        assert run(True) == run(False)

    def test_window_r_knob(self, model):
        """Greedy output is independent of the window length R (R only
        changes how much work one dispatch carries)."""
        ref = run_engine(model, async_windows=False)
        for r in (4, 16):
            assert run_engine(model, async_windows=True,
                              window_r=r) == ref
            assert run_engine(model, async_windows=False,
                              window_r=r) == ref

    def test_drain_composes_with_sync_modes(self, model):
        """A sync step after async steps must first drain the in-flight
        window (process its tokens, drop carries) — interleaving modes
        yields the same tokens as pure sync."""
        eng = make_engine(model, async_windows=True, n_slots=4)
        ids = [eng.add_request(p, 11) for p in PROMPTS[:3]]
        eng.step_window_async()
        eng.step_window_async()
        eng.step_window()            # drains, then runs a sync window
        out = {**eng.finished(), **eng.run_to_completion()}
        ref = run_engine(model, async_windows=False, prompts=PROMPTS[:3],
                         n_slots=4)
        assert [out[r] for r in ids] == ref
        assert eng._async_inflight is None and eng._async_carry is None

    def test_snapshot_drains_async(self, model, tmp_path):
        """snapshot() must observe a drained engine: restoring and
        continuing sync matches an uninterrupted async run."""
        params, cfg, specs = model
        eng = make_engine(model, async_windows=True, n_slots=4)
        ids = [eng.add_request(p, 11) for p in PROMPTS[:3]]
        eng.step_window_async()
        eng.step_window_async()
        done_before = eng.finished()
        eng.snapshot(str(tmp_path / "snap"))
        assert eng._async_inflight is None
        eng2 = ContinuousBatchingEngine.restore(
            str(tmp_path / "snap"), params, cfg, specs,
            EngineConfig(max_batch_size=4, max_seq_len=64,
                         prefill_chunk=8))
        out = {**done_before, **eng2.finished(),
               **eng2.run_to_completion()}
        ref = run_engine(model, async_windows=False, prompts=PROMPTS[:3],
                         n_slots=4)
        assert [out[r] for r in ids] == ref

    def test_snapshot_drains_async_with_eos(self, model, tmp_path):
        """snapshot() drains the in-flight window under the EOS contract
        it was DISPATCHED with (self._async_eos): a drain with eos=None
        would append post-EOS tokens and the restored slot would decode
        to its budget instead of stopping (ADVICE r4, medium)."""
        params, cfg, specs = model
        ref = run_engine(model, async_windows=False, prompts=PROMPTS[:3],
                         n_slots=4)
        eos = ref[0][4]
        ref = run_engine(model, async_windows=False, prompts=PROMPTS[:3],
                         n_slots=4, eos=eos)

        eng = make_engine(model, async_windows=True, n_slots=4)
        ids = [eng.add_request(p, 11) for p in PROMPTS[:3]]
        # enough async windows that request 0 crosses its EOS while a
        # window is still in flight at snapshot time
        for _ in range(3):
            eng.step_window_async(eos_token_id=eos)
        done_before = eng.finished()
        eng.snapshot(str(tmp_path / "snap_eos"))
        eng2 = ContinuousBatchingEngine.restore(
            str(tmp_path / "snap_eos"), params, cfg, specs,
            EngineConfig(max_batch_size=4, max_seq_len=64,
                         prefill_chunk=8))
        out = {**done_before, **eng2.finished(),
               **eng2.run_to_completion(eos_token_id=eos)}
        assert [out[r] for r in ids] == ref
        assert out[ids[0]][-1] == eos and len(out[ids[0]]) <= 11

    def test_unfolded_flush_bit_identical(self, model):
        """fold_flush=False (separate flush dispatch — the layout-
        conflict capacity fix, EngineConfig.fold_flush) must not change
        tokens in either window mode. Uses a flash/tail pool (int8 KV)
        because only tail-staged pools have a flush at all."""
        import dataclasses

        params, cfg, specs = model
        specs_f = dataclasses.replace(specs, attn_impl="flash")

        def run(async_windows, fold):
            eng = ContinuousBatchingEngine(
                params, cfg, specs_f,
                EngineConfig(max_batch_size=3, max_seq_len=64,
                             prefill_chunk=8, kv_dtype="int8",
                             async_windows=async_windows,
                             fold_flush=fold))
            assert eng.cache.k_tail is not None
            ids = [eng.add_request(p, 11) for p in PROMPTS]
            out = eng.run_to_completion()
            return [out[r] for r in ids]

        ref = run(False, True)
        assert run(False, False) == ref
        assert run(True, False) == ref
        assert run(True, True) == ref

    def test_empty_queue_noop(self, model):
        eng = make_engine(model, async_windows=True)
        assert eng.step_window_async() == 0
        rid = eng.add_request([5, 3], 4)
        out = eng.run_to_completion()
        assert len(out[rid]) == 4
