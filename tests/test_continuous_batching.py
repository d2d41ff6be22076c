"""Continuous batching: scheduler semantics + engine correctness vs the
uniform-batch engine."""
import jax
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine import InferenceEngine
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.engine.scheduler import PythonScheduler, make_scheduler
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, DecoderSpecs.fp16()


def make_cb_engine(model, n_slots=4, max_seq=64, native=True):
    params, cfg, specs = model
    return ContinuousBatchingEngine(
        params, cfg, specs,
        EngineConfig(max_batch_size=n_slots, max_seq_len=max_seq,
                     prefill_chunk=8),
        prefer_native_scheduler=native)


class TestScheduler:
    @pytest.mark.parametrize("native", [True, False])
    def test_fcfs_and_capacity(self, native):
        s = make_scheduler(2, 32, prefer_native=native)
        for rid in range(3):
            assert s.add_request(rid, 4, 8) == 0
        adm = s.admit()
        assert [a[0] for a in adm] == [0, 1]       # FCFS, capacity 2
        assert s.stats()["queued"] == 1
        # finish slot 0 -> next admit pulls request 2
        s.finish(adm[0][1])
        adm2 = s.admit()
        assert [a[0] for a in adm2] == [2]

    @pytest.mark.parametrize("native", [True, False])
    def test_token_budget(self, native):
        s = make_scheduler(1, 16, prefer_native=native)
        assert s.add_request(7, 10, 100) == 0      # clamped to 6
        (rid, slot), = s.admit()
        states = [s.on_token(slot) for _ in range(6)]
        assert states[:-1] == [0] * 5 and states[-1] == 1

    @pytest.mark.parametrize("native", [True, False])
    def test_invalid_request(self, native):
        s = make_scheduler(1, 16, prefer_native=native)
        assert s.add_request(0, 0, 5) < 0
        assert s.add_request(1, 16, 5) < 0

    def test_native_matches_python(self):
        """Differential test: same op sequence, same results."""
        import random
        rng = random.Random(0)
        a = make_scheduler(4, 64, prefer_native=True)
        b = PythonScheduler(4, 64)
        if type(a).__name__ == "PythonScheduler":
            pytest.skip("native lib unavailable")
        for step in range(200):
            op = rng.random()
            if op < 0.4:
                rid, pl, mnt = step, rng.randint(1, 63), rng.randint(1, 80)
                assert a.add_request(rid, pl, mnt) == b.add_request(rid, pl, mnt)
            elif op < 0.6:
                assert a.admit() == b.admit()
            elif op < 0.9:
                slot = rng.randrange(4)
                assert a.on_token(slot) == b.on_token(slot)
            else:
                slot = rng.randrange(4)
                assert a.finish(slot) == b.finish(slot)
            assert a.stats() == b.stats()
            assert a.active_slots() == b.active_slots()


class TestContinuousBatchingEngine:
    def test_matches_uniform_engine(self, model):
        """CB greedy output must equal the uniform engine's greedy output."""
        params, cfg, specs = model
        prompts = [[3, 1, 4, 1, 5], [2, 7], [9, 9, 8, 2, 1, 8, 2, 8]]
        ref_engine = InferenceEngine(
            params, cfg, specs, EngineConfig(max_seq_len=64, prefill_chunk=8))
        ref = {i: out for i, out in enumerate(
            ref_engine.generate(prompts, max_new_tokens=6))}

        eng = make_cb_engine(model)
        ids = [eng.add_request(p, 6) for p in prompts]
        results = eng.run_to_completion()
        assert set(results) == set(ids)
        for i, rid in enumerate(ids):
            assert results[rid] == ref[i], f"prompt {i}"

    def test_more_requests_than_slots(self, model):
        eng = make_cb_engine(model, n_slots=2)
        prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
        ids = [eng.add_request(p, 4) for p in prompts]
        results = eng.run_to_completion()
        assert set(results) == set(ids)
        assert all(len(v) == 4 for v in results.values())
        assert eng.stats()["finished"] == 5

    def test_staggered_arrivals(self, model):
        """Requests arriving mid-flight join without disturbing others."""
        params, cfg, specs = model
        eng = make_cb_engine(model, n_slots=4)
        r1 = eng.add_request([3, 1, 4, 1, 5], 8)
        for _ in range(3):
            eng.step()
        r2 = eng.add_request([2, 7], 4)
        results = eng.run_to_completion()
        # r1's output must match the dedicated engine regardless of r2
        ref_engine = InferenceEngine(
            params, cfg, specs, EngineConfig(max_seq_len=64, prefill_chunk=8))
        ref = ref_engine.generate([[3, 1, 4, 1, 5]], max_new_tokens=8)[0]
        assert results[r1] == ref
        assert len(results[r2]) == 4

    def test_single_token_prompt(self, model):
        eng = make_cb_engine(model)
        rid = eng.add_request([5], 3)
        results = eng.run_to_completion()
        assert len(results[rid]) == 3

    def test_eos_early_stop(self, model):
        eng = make_cb_engine(model)
        rid = eng.add_request([3, 1, 4, 1, 5], 8)
        first = None
        eng2 = make_cb_engine(model)
        rid2 = eng2.add_request([3, 1, 4, 1, 5], 8)
        full = eng2.run_to_completion()[rid2]
        eos = full[2]   # pretend the 3rd generated token is EOS
        results = eng.run_to_completion(eos_token_id=eos)
        assert results[rid][-1] == eos
        assert len(results[rid]) <= 8


class TestWindowedCB:
    """Device decode windows (R steps + flush in one dispatch) must be
    behaviorally identical to the stepwise path."""

    def _run(self, model, windowed, eos=None, n_slots=2):
        params, cfg, specs = model
        from mixq_tpu.config import EngineConfig

        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=n_slots, max_seq_len=64,
                         prefill_chunk=8, device_decode_loop=windowed))
        prompts = [[3, 1, 4, 1, 5], [2, 7], [9], [8, 2, 8, 1]]
        ids = [eng.add_request(p, 11) for p in prompts[:3]]
        for _ in range(3):
            eng.step()                 # stepwise prologue in BOTH modes
        ids.append(eng.add_request(prompts[3], 11))
        out = eng.run_to_completion(eos_token_id=eos)
        return [out[r] for r in ids]

    def test_window_matches_stepwise(self, model):
        got = self._run(model, windowed=True)
        ref = self._run(model, windowed=False)
        assert got == ref

    def test_window_eos_truncates_mid_window(self, model):
        ref = self._run(model, windowed=False)
        eos = ref[0][4]                # truncate request 0 mid-window
        got = self._run(model, windowed=True, eos=eos)
        exp = self._run(model, windowed=False, eos=eos)
        assert got == exp
        assert got[0][-1] == eos and len(got[0]) <= 11


class TestChunkedPrefill:
    """prefill_token_budget bounds per-dispatch prefill tokens (the
    slots=64 7B compile-OOM fix, VERDICT r3 item 2): big admission groups
    run bounded-T continuation chunks into one small cache. Output must be
    bit-identical to the unchunked path."""

    def _run(self, model, budget, prompts, new=5):
        params, cfg, specs = model
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=4, max_seq_len=32, prefill_chunk=4,
                         prefill_token_budget=budget))
        ids = [eng.add_request(p, new) for p in prompts]
        out = eng.run_to_completion()
        return [out[i] for i in ids]

    def test_chunked_matches_unchunked(self, model):
        prompts = [[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], [2, 7, 1, 8, 2, 8],
                   [9, 8, 7, 6, 5, 4, 3, 2, 1, 2, 3, 4, 5, 6], [4, 2]]
        # budget 8 at k_pad=4, Tp=16 -> Tc=4: four continuation chunks
        assert self._run(model, 8, prompts) == self._run(model, 0, prompts)

    def test_warmup_covers_chunked_plan(self, model):
        """warmup must pre-compile the (k, Tc) chunk programs the chunked
        admission path executes."""
        params, cfg, specs = model
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=4, max_seq_len=16, prefill_chunk=4,
                         prefill_token_budget=8))
        n = eng.warmup()
        assert n > 0
        ids = [eng.add_request([1, 2, 3, 4, 5, 6, 7, 8, 9], 3)
               for _ in range(3)]
        out = eng.run_to_completion()
        assert all(len(out[i]) == 3 for i in ids)


class TestWarmup:
    def test_warmup_compiles_program_set(self, model):
        """warmup() pre-compiles decode/window/prefill-bucket programs
        (a compile costs minutes at 7B over the relay; requests must
        never pay it) and the engine serves normally afterwards."""
        from mixq_tpu.config import EngineConfig

        params, cfg, specs = model
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=16, prefill_chunk=8))
        n = eng.warmup()
        # buckets Tp in {8, 16} x k in {1, 2} x (prefill + insert) = 8,
        # + decode + window (fp16 cache: no flush program)
        assert n == 10
        ids = [eng.add_request(p, 4) for p in ([1, 2, 3], [5])]
        out = eng.run_to_completion()
        assert all(len(out[i]) == 4 for i in ids)

    def test_warmup_covers_clamped_bucket(self, model):
        """max_seq not a chunk multiple: _admit_many clamps Tp to max_seq,
        so warmup must compile that bucket too (regression: long prompts
        paid a serve-time compile)."""
        from mixq_tpu.config import EngineConfig

        params, cfg, specs = model
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=20, prefill_chunk=8))
        n = eng.warmup()
        # buckets {8, 16, 20} x k {1, 2} x 2 programs + decode + window
        assert n == 14
        rid = eng.add_request(list(range(1, 19)), 2)   # Tp clamps to 20
        out = eng.run_to_completion()
        assert len(out[rid]) == 2


class TestStopTokensAndLogprobs:
    @pytest.mark.parametrize("windowed", [True, False])
    def test_per_request_stop_tokens(self, model, windowed):
        """A request with its own stop set finishes at the stop token
        (kept in the output) without disturbing its neighbors."""
        from mixq_tpu.config import EngineConfig

        params, cfg, specs = model

        def run(stop):
            eng = ContinuousBatchingEngine(
                params, cfg, specs,
                EngineConfig(max_batch_size=2, max_seq_len=64,
                             prefill_chunk=8, device_decode_loop=windowed))
            r1 = eng.add_request([3, 1, 4, 1, 5], 12, stop_token_ids=stop)
            r2 = eng.add_request([2, 7], 12)
            out = eng.run_to_completion()
            return out[r1], out[r2]

        full1, full2 = run(None)
        stop_tok = full1[4]
        got1, got2 = run([stop_tok])
        assert got1 == full1[:full1.index(stop_tok) + 1]
        assert got2 == full2                       # neighbor unaffected

    def test_finished_records_logprobs(self, model):
        from mixq_tpu.config import EngineConfig

        params, cfg, specs = model
        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=8))
        ids = [eng.add_request(p, 5) for p in ([3, 1, 4], [2, 7])]
        while eng.has_work:
            eng.step_window()
        recs = eng.finished_records()
        assert set(recs) == set(ids)
        for rid in ids:
            toks, lps = recs[rid]["tokens"], recs[rid]["logprobs"]
            assert len(lps) == len(toks) == 5
            assert all(np.isfinite(lp) and lp <= 0.0 for lp in lps)


class TestServingSoak:
    def test_randomized_arrivals_match_uniform_engine(self, model):
        """Randomized serving soak: 14 requests with random prompt
        lengths/budgets/arrival times through the windowed pool (slots
        reused many times, flushes crossing request lifetimes). Every
        greedy request's output must equal the dedicated uniform engine
        run of the same prompt."""
        import random

        from mixq_tpu.config import EngineConfig

        params, cfg, specs = model
        rng = random.Random(7)
        prompts = [[rng.randrange(1, 250) for _ in range(rng.randint(1, 14))]
                   for _ in range(14)]
        budgets = [rng.randint(1, 12) for _ in prompts]

        eng = ContinuousBatchingEngine(
            params, cfg, specs,
            EngineConfig(max_batch_size=3, max_seq_len=64, prefill_chunk=8))
        ids = {}
        results = {}
        pending = list(zip(prompts, budgets))
        step = 0
        while pending or eng.has_work:
            if pending and rng.random() < 0.5:
                p, b = pending.pop(0)
                ids[eng.add_request(p, b)] = (p, b)
            eng.step_window()
            results.update(eng.finished())
            step += 1
            assert step < 500, "soak did not drain"
        assert set(results) == set(ids)

        ref_engine = InferenceEngine(
            params, cfg, specs, EngineConfig(max_seq_len=64, prefill_chunk=8))
        for rid, (p, b) in ids.items():
            assert len(results[rid]) == b
            ref = ref_engine.generate([p], max_new_tokens=b)[0]
            assert results[rid] == ref, f"rid={rid} prompt={p}"


class TestPerRequestSampling:
    """Per-slot sampling params: heterogeneous requests in one compiled
    step (add_request(sampling=...))."""

    def test_sampler_matches_static_params(self):
        import jax.numpy as jnp

        from mixq_tpu.engine.sampling import (SamplingParams, sample,
                                              sample_per_slot)

        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) * 3
        B = 4
        # all-greedy rows == argmax
        out = sample_per_slot(logits, key, jnp.zeros((B,)),
                              jnp.zeros((B,), jnp.int32), jnp.ones((B,)))
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(jnp.argmax(logits, -1)))
        # uniform temperature+top_p rows == the static-param sampler
        sp = SamplingParams(temperature=0.7, top_p=0.8)
        ref = sample(logits, key, sp)
        got = sample_per_slot(logits, key, jnp.full((B,), 0.7),
                              jnp.zeros((B,), jnp.int32),
                              jnp.full((B,), 0.8))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_top_k_one_is_greedy(self):
        import jax.numpy as jnp

        from mixq_tpu.engine.sampling import sample_per_slot

        logits = jax.random.normal(jax.random.PRNGKey(2), (3, 32)) * 5
        out = sample_per_slot(logits, jax.random.PRNGKey(3),
                              jnp.full((3,), 1.0),
                              jnp.ones((3,), jnp.int32),   # top_k=1
                              jnp.ones((3,)))
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(jnp.argmax(logits, -1)))

    @pytest.mark.parametrize("windowed", [True, False])
    def test_mixed_batch_greedy_rows_unaffected(self, model, windowed):
        """A temperature request sharing the pool must not perturb the
        greedy requests' outputs."""
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine.sampling import SamplingParams

        params, cfg, specs = model

        def run(with_sampled):
            eng = ContinuousBatchingEngine(
                params, cfg, specs,
                EngineConfig(max_batch_size=3, max_seq_len=64,
                             prefill_chunk=8, device_decode_loop=windowed))
            g1 = eng.add_request([3, 1, 4, 1, 5], 9)
            g2 = eng.add_request([2, 7], 9)
            s = (eng.add_request([9, 9, 8], 9,
                                 sampling=SamplingParams(temperature=0.9,
                                                         top_k=8))
                 if with_sampled else None)
            out = eng.run_to_completion()
            return [out[g1], out[g2]], (out[s] if with_sampled else None)

        greedy_only, _ = run(False)
        mixed, sampled_row = run(True)
        assert mixed == greedy_only
        assert len(sampled_row) == 9


class TestScanPathCB:
    def test_cb_scan_matches_cb_loop(self, model):
        """Continuous batching over stacked (lax.scan) params — the
        fast-compile path — produces the same tokens as the python-loop
        params. (Round-1 gap: slot-mode decode raised NotImplementedError on
        the scan path; the scan body now scatters per-row KV writes.)"""
        from mixq_tpu.models.decoder import stack_decoder_params

        params, cfg, specs = model
        prompts = [[3, 5, 7], [2], [9, 4, 6, 8, 1], [1, 2]]

        def run(p):
            eng = ContinuousBatchingEngine(
                p, cfg, specs,
                EngineConfig(max_batch_size=4, max_seq_len=64,
                             prefill_chunk=8))
            for pr in prompts:
                eng.add_request(pr, max_new_tokens=6)
            return eng.run_to_completion()

        loop = run(params)
        scan = run(stack_decoder_params(params))
        assert loop.keys() == scan.keys()
        for rid in loop:
            assert loop[rid] == scan[rid], f"request {rid} diverged"

    def test_cb_scan_int8_kv(self, model):
        """Scan-path slot decode with quantized KV scales."""
        from mixq_tpu.models.decoder import stack_decoder_params

        params, cfg, specs = model
        prompts = [[3, 5, 7], [2, 4]]

        def run(p, kv):
            eng = ContinuousBatchingEngine(
                p, cfg, specs,
                EngineConfig(max_batch_size=2, max_seq_len=64,
                             prefill_chunk=8, kv_dtype=kv))
            for pr in prompts:
                eng.add_request(pr, max_new_tokens=5)
            return eng.run_to_completion()

        loop = run(params, "int8")
        scan = run(stack_decoder_params(params), "int8")
        for rid in loop:
            assert loop[rid] == scan[rid]
