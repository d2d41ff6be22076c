"""MixQLM adaptor (mixq_tpu/eval/lm_eval_adaptor.py) exercised without the
lm-eval harness: a fake tokenizer + request objects drive the real scoring
machinery, and _score's span math is checked against a direct forward.
(Reference utils/lm_eval_adaptor.py:7-114 is only ever exercised through the
external harness; here the adaptor logic itself is under test.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixq_tpu.config import ModelConfig
from mixq_tpu.eval.lm_eval_adaptor import MixQLM
from mixq_tpu.models import DecoderSpecs, KVCache
from mixq_tpu.models.decoder import forward, init_decoder_params
from mixq_tpu.ops.mixed_linear import LinearSpec


class FakeTok:
    """Character-level fake tokenizer (ids = bytes mod vocab)."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self, vocab=256):
        self.vocab = vocab

    def __call__(self, text, add_special_tokens=True):
        class R:
            pass

        r = R()
        r.input_ids = [3 + (b % (self.vocab - 3)) for b in text.encode()]
        if add_special_tokens:
            r.input_ids = [self.bos_token_id] + r.input_ids
        return r

    def decode(self, ids):
        return " ".join(map(str, ids))


class FakeReq:
    def __init__(self, *args):
        self.args = args


@pytest.fixture(scope="module")
def lm():
    cfg = ModelConfig.tiny()
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    return MixQLM(params, cfg, specs, FakeTok(cfg.vocab_size),
                  batch_size=4, max_length=64), cfg, specs, params


class TestScoreSpanMath:
    def test_score_matches_direct_forward(self, lm):
        mixqlm, cfg, specs, params = lm
        ctx, cont = [1, 5, 9, 4], [7, 3]
        (lp, greedy), = mixqlm._score([(ctx, cont)])

        # direct reference: full-sequence forward, sum logprobs of the
        # continuation tokens under the model's prediction at t-1
        ids = ctx + cont
        T = len(ids)
        cache = KVCache.create(cfg.num_hidden_layers, 1, T,
                               cfg.num_key_value_heads, cfg.head_dim_,
                               jnp.bfloat16)
        logits, _ = jax.jit(forward, static_argnames=("specs", "cfg"))(
            params, jnp.asarray([ids], jnp.int32), cache, specs=specs,
            cfg=cfg, kv_start=jnp.zeros((1,), jnp.int32))
        logp = np.asarray(jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1))[0]
        want = sum(float(logp[t - 1, ids[t]]) for t in range(len(ctx), T))
        want_greedy = all(
            int(np.argmax(logp[t - 1])) == ids[t] for t in range(len(ctx), T))
        assert lp == pytest.approx(want, rel=1e-4, abs=1e-4)
        assert greedy == want_greedy

    def test_batched_scores_match_single(self, lm):
        mixqlm, *_ = lm
        pairs = [([1, 5, 9], [7]), ([1, 8], [4, 4, 6]), ([1], [9, 9])]
        got = mixqlm._score(pairs)
        for pair, (lp, g) in zip(pairs, got):
            (lp1, g1), = mixqlm._score([pair])
            assert lp == pytest.approx(lp1, rel=1e-3, abs=1e-3)
            assert g == g1

    def test_cont_filling_whole_window_is_clamped(self, lm):
        mixqlm, *_ = lm
        # continuation longer than max_length: truncated from the left and
        # the first slot (no predictor position) dropped — must not crash
        # or index position -1
        cont = [5] * (mixqlm.max_length + 8)
        (lp, greedy), = mixqlm._score([(([1]), cont)])
        assert np.isfinite(lp)


class TestHarnessAPI:
    def test_loglikelihood_and_ordering(self, lm):
        mixqlm, *_ = lm
        reqs = [FakeReq("abc", " d"), FakeReq("", " xy")]
        out = mixqlm.loglikelihood(reqs)
        assert len(out) == 2
        for lp, greedy in out:
            assert np.isfinite(lp) and isinstance(greedy, (bool, np.bool_))

    def test_loglikelihood_rolling(self, lm):
        mixqlm, *_ = lm
        out = mixqlm.loglikelihood_rolling([FakeReq("hello world")])
        assert len(out) == 1 and np.isfinite(out[0])

    def test_generate_until(self, lm):
        mixqlm, *_ = lm
        outs = mixqlm.generate_until(
            [FakeReq("ab", {"max_gen_toks": 4})])
        assert len(outs) == 1 and isinstance(outs[0], str)


class TestOfflineTaskEndToEnd:
    """A full task flowing through the adaptor's actual request/response
    interface (VERDICT r3 item 5): vendored offline tasks
    (eval/offline_tasks.py) on the Markov substrate, where the true
    continuation is deterministic — a correct loglikelihood AND
    generate_until path each score ~1.0, far above the 0.25 chance."""

    @pytest.fixture(scope="class")
    def markov_lm(self):
        from mixq_tpu.eval.offline_tasks import IntTokenizer
        from mixq_tpu.models.hf import params_from_source
        from mixq_tpu.utils.substrate import make_markov_state
        from mixq_tpu.utils.testing import DictSource

        cfg = ModelConfig(model_type="llama", vocab_size=512,
                          hidden_size=256, intermediate_size=704,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=4)
        state, succ = make_markov_state(cfg, v_eff=128, seed=0,
                                        mean_cycle=12)
        specs = DecoderSpecs.fp16()
        params = params_from_source(DictSource(state), cfg, specs)
        lm = MixQLM(params, cfg, specs, IntTokenizer(),
                    batch_size=8, max_length=64)
        # "corpus": one long chain walk
        walk = [5]
        for _ in range(400):
            walk.append(int(succ[walk[-1]]))
        return lm, np.asarray(walk, np.int32)

    def test_cloze_loglikelihood_path(self, markov_lm):
        from mixq_tpu.eval.offline_tasks import (build_cloze_task,
                                                 evaluate_cloze)

        lm, corpus = markov_lm
        items = build_cloze_task(corpus, n_items=16, ctx_len=8, cont_len=3)
        res = evaluate_cloze(lm, items)
        assert res["acc"] >= 0.9, res        # deterministic chain

    def test_completion_generate_path(self, markov_lm):
        from mixq_tpu.eval.offline_tasks import (build_completion_task,
                                                 evaluate_completion)

        lm, corpus = markov_lm
        items = build_completion_task(corpus, n_items=8, ctx_len=8,
                                      gen_len=3)
        res = evaluate_completion(lm, items)
        assert res["exact_match"] >= 0.9, res
