"""Speculative decoding in the continuous-batching pool.

step_spec() runs a T=spec_k verify forward over all slots: greedy rows
draft from their own history (prompt-lookup n-grams) and accept the
matching greedy prefix; sampled rows ride the same program emitting one
token. The contract: CB+spec output is BIT-IDENTICAL to plain CB greedy
output — the model's own argmax decides acceptance (no reference
counterpart; north-star serving capability per VERDICT r2 item 5).
"""
import jax
import numpy as np
import pytest

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine.batching import ContinuousBatchingEngine
from mixq_tpu.engine.sampling import SamplingParams
from mixq_tpu.models import DecoderSpecs
from mixq_tpu.models.decoder import init_decoder_params


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig.tiny()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, DecoderSpecs.fp16()


def make_engine(model, spec_k=0, n_slots=3, max_seq=96, kv="bfloat16",
                attn="auto"):
    import dataclasses

    params, cfg, specs = model
    if attn != "auto":
        specs = dataclasses.replace(specs, attn_impl=attn)
    return ContinuousBatchingEngine(
        params, cfg, specs,
        EngineConfig(max_batch_size=n_slots, max_seq_len=max_seq,
                     prefill_chunk=8, kv_dtype=kv, spec_k=spec_k))


# prompts with internal repetition so prompt-lookup drafting actually
# fires (tiny random models also tend to emit loops, feeding the n-grams)
PROMPTS = [
    [5, 6, 7, 5, 6, 7, 5, 6],
    [2, 9, 2, 9, 2, 9, 2],
    [1, 3, 8],
]


class TestSpecMatchesGreedy:
    @pytest.mark.parametrize("kv", ["bfloat16", "int8"])
    def test_bit_identical_tokens_and_logprobs(self, model, kv):
        budgets = [20, 16, 12]

        def drive(eng, spec):
            recs = {}
            steps = 0
            while eng.has_work:
                eng.step_spec() if spec else eng.step()
                recs.update(eng.finished_records())
                steps += 1
                assert steps < 400
            return recs

        eng_ref = make_engine(model, spec_k=0, kv=kv)
        ids_r = [eng_ref.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        recs_r = drive(eng_ref, False)

        eng_s = make_engine(model, spec_k=4, kv=kv)
        ids_s = [eng_s.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        recs_s = drive(eng_s, True)

        for rr, rs in zip(ids_r, ids_s):
            assert recs_s[rs]["tokens"] == recs_r[rr]["tokens"]
            np.testing.assert_allclose(recs_s[rs]["logprobs"],
                                       recs_r[rr]["logprobs"],
                                       rtol=1e-4, atol=1e-5)
        # fewer verify forwards than emitted tokens = speculation worked
        st = eng_s.spec_stats
        assert st["accepted"] > 0, "no draft token ever accepted"
        assert st["forwards"] < st["emitted"]

    def test_spec_k_larger_than_budget(self, model):
        """A request whose budget finishes mid-verify drops the overflow."""
        eng_ref = make_engine(model, spec_k=0)
        r = eng_ref.add_request(PROMPTS[0], 3)
        ref = eng_ref.run_to_completion()[r]

        eng = make_engine(model, spec_k=6)
        rid = eng.add_request(PROMPTS[0], 3)
        out = eng.run_to_completion()[rid]
        assert out == ref and len(out) == 3


class TestSpecHeterogeneous:
    def test_sampled_rows_ride_along(self, model):
        """Greedy rows must be unperturbed by a temperature neighbor, and
        the sampled row emits exactly its budget (one token per verify)."""

        def run(with_sampled, spec_k):
            eng = make_engine(model, spec_k=spec_k)
            g1 = eng.add_request(PROMPTS[0], 10)
            g2 = eng.add_request(PROMPTS[1], 10)
            s = (eng.add_request([4, 4, 2], 10,
                                 sampling=SamplingParams(temperature=0.8,
                                                         top_k=8))
                 if with_sampled else None)
            out = eng.run_to_completion()
            return [out[g1], out[g2]], (out[s] if with_sampled else None)

        plain, _ = run(False, spec_k=0)
        spec_mixed, sampled = run(True, spec_k=4)
        assert spec_mixed == plain
        assert len(sampled) == 10

    def test_stop_token_inside_accepted_span(self, model):
        """A stop token accepted mid-span truncates there (kept in the
        output), exactly like the stepwise path."""
        eng_ref = make_engine(model, spec_k=0)
        r = eng_ref.add_request(PROMPTS[0], 14)
        full = eng_ref.run_to_completion()[r]
        stop = full[6]

        def run(spec_k):
            eng = make_engine(model, spec_k=spec_k)
            rid = eng.add_request(PROMPTS[0], 14, stop_token_ids=[stop])
            return eng.run_to_completion()[rid]

        ref = run(0)
        got = run(4)
        assert got == ref
        assert got[-1] == stop and len(got) <= 14

    def test_eos_param(self, model):
        eng_ref = make_engine(model, spec_k=0)
        r = eng_ref.add_request(PROMPTS[1], 12)
        full = eng_ref.run_to_completion()[r]
        eos = full[5]

        eng = make_engine(model, spec_k=4)
        rid = eng.add_request(PROMPTS[1], 12)
        got = eng.run_to_completion(eos_token_id=eos)[rid]
        eng2 = make_engine(model, spec_k=0)
        rid2 = eng2.add_request(PROMPTS[1], 12)
        ref = eng2.run_to_completion(eos_token_id=eos)[rid2]
        assert got == ref and got[-1] == eos


class TestSpecSoak:
    def test_randomized_arrivals(self, model):
        """Slot churn under speculation: staggered arrivals, varied
        budgets — every request matches its plain-greedy run."""
        import random

        rng = random.Random(11)
        prompts = []
        for _ in range(8):
            base = [rng.randrange(1, 250) for _ in range(rng.randint(2, 5))]
            prompts.append((base * 3)[:rng.randint(3, 12)])
        budgets = [rng.randint(1, 10) for _ in prompts]

        def run(spec_k):
            eng = make_engine(model, spec_k=spec_k, n_slots=3)
            ids, results = [], {}
            pending = list(zip(prompts, budgets))
            steps = 0
            while pending or eng.has_work:
                if pending and rng.random() < 0.6:
                    p, b = pending.pop(0)
                    ids.append(eng.add_request(p, b))
                if spec_k > 1:
                    eng.step_spec()
                else:
                    eng.step()
                results.update(eng.finished())
                steps += 1
                assert steps < 800
            return [results[r] for r in ids]

        rng_state = rng.getstate()
        ref = run(0)
        rng.setstate(rng_state)   # same arrival schedule
        got = run(4)
        assert got == ref


class TestDeviceSpecWindow:
    """step_spec_window: R draft+verify+accept rounds in ONE dispatch with
    ON-DEVICE n-gram drafting — the serving spec path (host-loop step_spec
    pays a relay round-trip per verify forward)."""

    def test_propose_device_matches_python(self):
        """propose_ngram_device row semantics == propose_ngram, including
        draft lengths, over randomized repetitive histories."""
        import random

        import jax.numpy as jnp

        from mixq_tpu.engine.speculative import (propose_ngram,
                                                 propose_ngram_device)

        rng = random.Random(7)
        H = 48
        for trial in range(40):
            B = rng.randint(1, 4)
            hists, hlens = np.zeros((B, H), np.int32), np.zeros(B, np.int32)
            rows = []
            for b in range(B):
                base = [rng.randrange(0, 6) for _ in range(rng.randint(1, 8))]
                h = (base * 5)[:rng.randint(1, H)]
                rows.append(h)
                hists[b, :len(h)] = h
                hlens[b] = len(h)
            for n in (1, 2, 3):
                for k in (1, 3, 7):
                    draft, dlen = propose_ngram_device(
                        jnp.asarray(hists), jnp.asarray(hlens), n, k)
                    draft, dlen = np.asarray(draft), np.asarray(dlen)
                    for b, h in enumerate(rows):
                        want = propose_ngram(h, n, k)
                        assert dlen[b] == len(want), (h, n, k)
                        assert list(draft[b, :dlen[b]]) == want, (h, n, k)

    def test_accept_greedy(self):
        import jax.numpy as jnp

        from mixq_tpu.engine.speculative import accept_greedy

        preds = jnp.asarray([[3, 4, 5], [3, 9, 5], [7, 8, 9]], jnp.int32)
        draft = jnp.asarray([[3, 4, 5], [3, 4, 5], [7, 8, 9]], jnp.int32)
        dlen = jnp.asarray([3, 3, 1], jnp.int32)
        a = np.asarray(accept_greedy(preds, draft, dlen))
        assert list(a) == [3, 1, 1]

    @pytest.mark.parametrize("kv", ["bfloat16", "int8"])
    def test_window_bit_identical(self, model, kv):
        """Device spec window == plain greedy, tokens AND logprobs, and
        the device drafter must actually accept (the repetitive prompts
        guarantee matches)."""
        budgets = [20, 16, 12]

        eng_ref = make_engine(model, spec_k=0, kv=kv)
        ids_r = [eng_ref.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        recs_r = {}
        while eng_ref.has_work:
            eng_ref.step()
            recs_r.update(eng_ref.finished_records())

        eng_s = make_engine(model, spec_k=4, kv=kv)
        ids_s = [eng_s.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        recs_s = {}
        steps = 0
        while eng_s.has_work:
            eng_s.step_spec_window()
            recs_s.update(eng_s.finished_records())
            steps += 1
            assert steps < 100
        for rr, rs in zip(ids_r, ids_s):
            assert recs_s[rs]["tokens"] == recs_r[rr]["tokens"]
            np.testing.assert_allclose(recs_s[rs]["logprobs"],
                                       recs_r[rr]["logprobs"],
                                       rtol=1e-4, atol=1e-5)
        st = eng_s.spec_stats
        assert st["accepted"] > 0, "device drafter never accepted"

    def test_window_soak_with_churn(self, model):
        """Slot churn through the window path: staggered arrivals +
        mixed budgets, every request matches plain greedy (slot reuse
        must rewrite the on-device history rows)."""
        import random

        rng = random.Random(13)
        prompts = []
        for _ in range(8):
            base = [rng.randrange(1, 250) for _ in range(rng.randint(2, 5))]
            prompts.append((base * 3)[:rng.randint(3, 12)])
        budgets = [rng.randint(1, 12) for _ in prompts]

        def run(spec_k):
            eng = make_engine(model, spec_k=spec_k, n_slots=3)
            ids, results = [], {}
            pending = list(zip(prompts, budgets))
            steps = 0
            while pending or eng.has_work:
                if pending and rng.random() < 0.6:
                    p, b = pending.pop(0)
                    ids.append(eng.add_request(p, b))
                if spec_k > 1:
                    eng.step_spec_window()
                else:
                    eng.step()
                results.update(eng.finished())
                steps += 1
                assert steps < 800
            return [results[r] for r in ids]

        rng_state = rng.getstate()
        ref = run(0)
        rng.setstate(rng_state)
        got = run(4)
        assert got == ref

    def test_draft_noise_instrument(self, model):
        """spec_draft_noise (the acceptance-curve instrument): output
        stays bit-identical to plain greedy at any noise level — only
        draft agreement (and speculation's speed) changes — and heavy
        noise measurably kills acceptance."""
        import dataclasses

        params, cfg, specs = model
        budgets = [20, 16, 12]

        def run(noise):
            eng = ContinuousBatchingEngine(
                params, cfg, specs,
                dataclasses.replace(
                    EngineConfig(max_batch_size=3, max_seq_len=96,
                                 prefill_chunk=8, spec_k=4),
                    spec_draft_noise=noise))
            ids = [eng.add_request(p, b)
                   for p, b in zip(PROMPTS, budgets)]
            out = {}
            steps = 0
            while eng.has_work:
                eng.step_spec_window()
                out.update(eng.finished())
                steps += 1
                assert steps < 200
            st = eng.spec_stats
            rate = st["accepted"] / max(st["drafted"], 1)
            return [out[r] for r in ids], rate

        clean, rate0 = run(0.0)
        noisy, rate9 = run(0.9)
        eng_ref = make_engine(model, spec_k=0)
        ids = [eng_ref.add_request(p, b)
               for p, b in zip(PROMPTS, budgets)]
        ref = eng_ref.run_to_completion()
        assert clean == [ref[r] for r in ids]
        assert noisy == clean
        assert rate9 < rate0, (rate9, rate0)

    def test_sampled_rows_in_window(self, model):
        """Heterogeneous window: greedy rows unperturbed by a sampled
        neighbor, sampled row emits its full budget."""
        eng = make_engine(model, spec_k=4)
        g1 = eng.add_request(PROMPTS[0], 10)
        s = eng.add_request([4, 4, 2], 10,
                            sampling=SamplingParams(temperature=0.8,
                                                    top_k=8))
        out = eng.run_to_completion()   # routes through step_spec_window

        eng_ref = make_engine(model, spec_k=0)
        gr = eng_ref.add_request(PROMPTS[0], 10)
        ref = eng_ref.run_to_completion()
        assert out[g1] == ref[gr]
        assert len(out[s]) == 10


class TestSpecBoundary:
    def test_cache_brim_request_stays_correct(self, model):
        """A request that fills the cache to the brim: spec engines
        reserve spec_k-1 trailing slots (a T=k verify at slot_length s
        writes rows s..s+k-1), so the spec run emits a k-1-shorter but
        position-exact PREFIX of the plain run — never tokens computed
        at clamped positions."""
        max_seq, k = 32, 4
        prompt = PROMPTS[0]

        def run(spec_k):
            eng = make_engine(model, spec_k=spec_k, n_slots=2,
                              max_seq=max_seq)
            rid = eng.add_request(prompt, 1000)   # budget-clamped to room
            return eng.run_to_completion()[rid]

        ref = run(0)
        got = run(k)
        assert len(ref) == max_seq - len(prompt)
        assert len(got) == max_seq - (k - 1) - len(prompt)
        assert got == ref[:len(got)]


class TestAdaptiveSpec:
    """step_serve: spec windows while the measured gain pays, plain
    windows (with periodic resynced re-probes) when it doesn't — greedy
    output bit-identical in every mode and across mode switches."""

    def _ref(self, model, prompts, budgets):
        eng = make_engine(model, spec_k=0)
        ids = [eng.add_request(p, b) for p, b in zip(prompts, budgets)]
        out = eng.run_to_completion()
        return [out[r] for r in ids]

    def test_forced_fallback_still_bit_identical(self, model):
        """An impossible gain threshold forces the plain-window fallback
        (incl. re-probe windows); output must not change."""
        import dataclasses

        params, cfg, specs = model
        budgets = [24, 20, 16]
        ref = self._ref(model, PROMPTS, budgets)

        ecfg = dataclasses.replace(
            EngineConfig(max_batch_size=3, max_seq_len=96, prefill_chunk=8,
                         spec_k=4),
            spec_min_gain=99.0, spec_probe_len=1, spec_probe_every=3)
        eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        ids = [eng.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        out = eng.run_to_completion()
        assert [out[r] for r in ids] == ref
        assert eng._spec_mode == "plain" or eng._plain_since_probe >= 0

    def test_mode_switches_and_resync(self, model):
        """The engine must actually take the fallback path AND come back
        through a probe (counters prove both transitions happened)."""
        import dataclasses

        params, cfg, specs = model
        ecfg = dataclasses.replace(
            EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=8,
                         spec_k=4),
            spec_min_gain=99.0, spec_probe_len=1, spec_probe_every=2)
        eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        rid = eng.add_request(PROMPTS[0], 40)
        saw_plain = saw_probe = False
        while eng.has_work:
            before = eng._spec_mode
            eng.step_serve()
            if before == "plain":
                saw_plain = True
            if before == "plain" and eng._spec_mode == "spec":
                saw_probe = True
        assert saw_plain, "never fell back to plain windows"
        assert saw_probe or eng._spec_mode == "spec", \
            "never re-probed speculation"
        out = eng.finished()[rid]
        ref = self._ref(model, [PROMPTS[0]], [40])[0]
        assert out == ref

    def test_policy_state_machine(self, model):
        """Deterministic policy check with stubbed windows: high gain
        stays spec; low gain falls back after spec_probe_len windows;
        plain mode re-probes after spec_probe_every windows."""
        import dataclasses

        params, cfg, specs = model
        ecfg = dataclasses.replace(
            EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=8,
                         spec_k=4),
            spec_probe_len=2, spec_probe_every=3, spec_min_gain=1.15)
        eng = ContinuousBatchingEngine(params, cfg, specs, ecfg)
        calls = []
        gain = {"v": 2.0}

        def fake_spec(*a, **k):
            calls.append("spec")
            eng._last_spec_gain = gain["v"]
            return 1

        def fake_plain(*a, **k):
            calls.append("plain")
            return 1

        eng.step_spec_window = fake_spec
        eng.step_window = fake_plain

        for _ in range(4):
            eng.step_serve()
        assert eng._spec_mode == "spec" and calls == ["spec"] * 4

        gain["v"] = 1.0                      # speculation stops paying
        for _ in range(2):
            eng.step_serve()
        assert eng._spec_mode == "plain"

        for _ in range(3):                   # spec_probe_every plain windows
            eng.step_serve()
        assert eng._spec_mode == "spec"      # re-probing
        assert calls[-3:] == ["plain"] * 3

        gain["v"] = 2.0                      # probe finds gain again
        for _ in range(2):
            eng.step_serve()
        assert eng._spec_mode == "spec"
        assert calls[-2:] == ["spec"] * 2


class TestNativeDrafter:
    def test_native_matches_python(self):
        """The C++ n-gram matcher must propose exactly what the Python
        propose_ngram does over randomized histories."""
        import random

        from mixq_tpu.engine.scheduler import (NativeDrafter, PythonDrafter,
                                               make_drafter)

        nat = make_drafter(2)
        if not isinstance(nat, NativeDrafter):
            pytest.skip("native lib unavailable")
        py = PythonDrafter(2)
        rng = random.Random(3)
        for trial in range(50):
            base = [rng.randrange(0, 6) for _ in range(rng.randint(1, 8))]
            hist = (base * 4)[:rng.randint(1, 30)]
            slot = trial % 2
            nat.reset(slot, hist)
            py.reset(slot, hist)
            for _ in range(3):
                ext = [rng.randrange(0, 6) for _ in range(rng.randint(0, 4))]
                nat.append(slot, ext)
                py.append(slot, ext)
                for n in (1, 2, 3):
                    for k in (1, 4, 8):
                        assert nat.propose(slot, n, k) == py.propose(
                            slot, n, k), (hist, ext, n, k)


class TestSpecFlashPool:
    """Speculation on the SERVING DEFAULT pool (attn_impl='flash',
    head-major per-row-tail cache, int8 KV): T=spec_k verify tokens
    stage in the row's tail window and the flash kernel's tail attend
    covers them per-query (VERDICT r4 item 3 — before r5 the two
    serving wins, flash-int8 windows and device speculation, were
    mutually exclusive). Reference composes flash_attn with its
    quantized linears unconditionally (modules/fused/attn.py:256)."""

    @pytest.mark.parametrize("kv", ["bfloat16", "int8"])
    def test_spec_window_bit_identical_on_flash(self, model, kv):
        """Device spec window on a flash pool == plain greedy on the
        SAME flash pool (same attend numerics), tokens and logprobs."""
        budgets = [20, 16, 12]

        eng_ref = make_engine(model, spec_k=0, kv=kv, attn="flash")
        assert eng_ref.cache.head_major and eng_ref.cache.k_tail is not None
        ids_r = [eng_ref.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        recs_r = {}
        while eng_ref.has_work:
            eng_ref.step_window()
            recs_r.update(eng_ref.finished_records())

        eng_s = make_engine(model, spec_k=4, kv=kv, attn="flash")
        assert eng_s.cache.head_major and eng_s.cache.k_tail is not None
        assert eng_s.cache.k_tail.shape[1] >= \
            eng_s.ecfg.spec_window_r * eng_s.ecfg.spec_k
        ids_s = [eng_s.add_request(p, b) for p, b in zip(PROMPTS, budgets)]
        recs_s = {}
        steps = 0
        while eng_s.has_work:
            eng_s.step_spec_window()
            recs_s.update(eng_s.finished_records())
            steps += 1
            assert steps < 100
        for rr, rs in zip(ids_r, ids_s):
            assert recs_s[rs]["tokens"] == recs_r[rr]["tokens"]
            np.testing.assert_allclose(recs_s[rs]["logprobs"],
                                       recs_r[rr]["logprobs"],
                                       rtol=1e-4, atol=1e-5)
        assert eng_s.spec_stats["accepted"] > 0, \
            "device drafter never accepted on the flash pool"

    def test_spec_flash_unfolded_flush(self, model):
        """spec windows on the flash pool with fold_flush=False (the
        capacity-fix flush mode) stay bit-identical."""
        import dataclasses

        params, cfg, specs = model
        specs_f = dataclasses.replace(specs, attn_impl="flash")

        def run(spec_k, fold):
            eng = ContinuousBatchingEngine(
                params, cfg, specs_f,
                EngineConfig(max_batch_size=3, max_seq_len=96,
                             prefill_chunk=8, kv_dtype="int8",
                             spec_k=spec_k, fold_flush=fold))
            ids = [eng.add_request(p, b)
                   for p, b in zip(PROMPTS, [18, 14, 10])]
            out = {}
            steps = 0
            while eng.has_work:
                eng.step_spec_window() if spec_k else eng.step_window()
                out.update(eng.finished())
                steps += 1
                assert steps < 100
            return [out[r] for r in ids]

        ref = run(0, True)
        assert run(4, False) == ref
        assert run(0, False) == ref

    def test_host_loop_spec_on_flash(self, model):
        """step_spec (one verify per dispatch + host accept) flushes the
        tail every call — bit-identical to plain on the flash pool."""
        eng_ref = make_engine(model, spec_k=0, kv="int8", attn="flash")
        r = eng_ref.add_request(PROMPTS[0], 18)
        ref = eng_ref.run_to_completion()[r]

        eng = make_engine(model, spec_k=4, kv="int8", attn="flash")
        rid = eng.add_request(PROMPTS[0], 18)
        out = {}
        steps = 0
        while eng.has_work:
            eng.step_spec()
            out.update(eng.finished())
            steps += 1
            assert steps < 100
        assert out[rid] == ref

    def test_flash_spec_churn(self, model):
        """Slot reuse under speculation on the flash pool: the freed
        slot's tail window must reset cleanly on re-admission."""
        import random

        rng = random.Random(23)
        prompts = []
        for _ in range(7):
            base = [rng.randrange(1, 250) for _ in range(rng.randint(2, 5))]
            prompts.append((base * 3)[:rng.randint(3, 12)])
        budgets = [rng.randint(1, 12) for _ in prompts]

        def run(spec_k):
            eng = make_engine(model, spec_k=spec_k, n_slots=3, kv="int8",
                              attn="flash")
            ids, results = [], {}
            pending = list(zip(prompts, budgets))
            steps = 0
            while pending or eng.has_work:
                if pending and rng.random() < 0.6:
                    p, b = pending.pop(0)
                    ids.append(eng.add_request(p, b))
                if spec_k > 1:
                    eng.step_spec_window()
                else:
                    eng.step_window()
                results.update(eng.finished())
                steps += 1
                assert steps < 800
            return [results[r] for r in ids]

        rng_state = rng.getstate()
        ref = run(0)
        rng.setstate(rng_state)
        got = run(4)
        assert got == ref


class TestSpecGuards:
    def test_sliding_window_rejected(self):
        cfg = ModelConfig.tiny(sliding_window=16)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="sliding-window"):
            ContinuousBatchingEngine(
                params, cfg, DecoderSpecs.fp16(),
                EngineConfig(max_batch_size=2, max_seq_len=64,
                             prefill_chunk=8, spec_k=4))

    def test_stacked_params_rejected(self, model):
        from mixq_tpu.models.decoder import stack_decoder_params

        params, cfg, specs = model
        with pytest.raises(ValueError, match="stacked"):
            ContinuousBatchingEngine(
                stack_decoder_params(params), cfg, specs,
                EngineConfig(max_batch_size=2, max_seq_len=64,
                             prefill_chunk=8, spec_k=4))

    def test_warmup_includes_verify(self, model):
        eng = make_engine(model, spec_k=4, n_slots=2, max_seq=16)
        n = eng.warmup()
        # {8, 16} buckets x k {1, 2} x 2 + decode + verify + spec window
        # + plain window (the adaptive-speculation fallback program)
        assert n == 12
        rid = eng.add_request([1, 2, 3], 4)
        out = eng.run_to_completion()
        assert len(out[rid]) == 4
