"""EleutherAI lm-evaluation-harness adaptor (reference
utils/lm_eval_adaptor.py:7-114). Gated on lm_eval availability — this build
environment doesn't ship it; the adaptor activates wherever it's installed.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from lm_eval.api.model import LM  # lm-eval >= 0.4 API

    _HAVE_LM_EVAL = True
except Exception:  # pragma: no cover - environment without lm_eval
    LM = object
    _HAVE_LM_EVAL = False

from mixq_tpu.config import ModelConfig
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache


class MixQLM(LM):
    """lm-eval LM over a mixq_tpu decoder: loglikelihood via one jitted
    forward per (context+continuation) batch."""

    def __init__(self, params: DecoderParams, cfg: ModelConfig,
                 specs: DecoderSpecs, tokenizer, batch_size: int = 8,
                 max_length: int = 2048):
        # constructible without lm_eval (LM falls back to `object`): the
        # scoring machinery below has no harness dependency, so it stays
        # testable in environments that don't ship lm-eval; running inside
        # lm_eval.simple_evaluate needs the real base class (examples/
        # lm_eval_run.py guards that).
        super().__init__()
        self.params = params
        self.cfg = cfg
        self.specs = specs
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        self._fwd = jax.jit(
            lambda p, t, c, s: forward(p, t, c, specs, cfg, kv_start=s))

    def _score(self, prompts: List[Tuple[List[int], List[int]]]):
        """[(ctx_ids, cont_ids)] -> [(logprob, is_greedy)]."""
        B = len(prompts)
        T = min(self.max_length,
                max(len(c) + len(x) for c, x in prompts))
        toks = np.zeros((B, T), np.int32)
        start = np.zeros((B,), np.int32)
        spans = []
        for i, (ctx, cont) in enumerate(prompts):
            ids = (ctx + cont)[-T:]
            toks[i, T - len(ids):] = ids
            start[i] = T - len(ids)
            # first continuation slot; clamped to 1 so the logprob of slot t
            # always comes from the model's prediction at t-1 (a continuation
            # that fills the whole window loses its first token — same
            # truncation the reference harness applies)
            spans.append((max(T - len(cont), 1), T))
        cache = KVCache.create(
            self.cfg.num_hidden_layers, B, T, self.cfg.num_key_value_heads,
            self.cfg.head_dim_, jnp.bfloat16)
        logits, _ = self._fwd(self.params, jnp.asarray(toks), cache,
                              jnp.asarray(start))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = np.asarray(logp)
        out = []
        for i, (lo, hi) in enumerate(spans):
            lp, greedy = 0.0, True
            for t in range(lo, hi):
                tok = toks[i, t]
                lp += float(logp[i, t - 1, tok])
                greedy &= int(np.argmax(logp[i, t - 1])) == int(tok)
            out.append((lp, greedy))
        return out

    # -- lm-eval API -------------------------------------------------------

    def loglikelihood(self, requests):
        results = []
        pairs = []
        for req in requests:
            ctx, cont = req.args
            ctx_ids = self.tokenizer(ctx).input_ids if ctx else [
                self.tokenizer.bos_token_id or 1]
            cont_ids = self.tokenizer(
                cont, add_special_tokens=False).input_ids
            pairs.append((ctx_ids, cont_ids))
        for i in range(0, len(pairs), self.batch_size):
            results.extend(self._score(pairs[i:i + self.batch_size]))
        return results

    def loglikelihood_rolling(self, requests):
        results = []
        for req in requests:
            (text,) = req.args
            ids = self.tokenizer(text).input_ids
            (lp, _), = self._score([([self.tokenizer.bos_token_id or 1],
                                     ids[: self.max_length - 1])])
            results.append(lp)
        return results

    def generate_until(self, requests):
        from mixq_tpu.config import EngineConfig
        from mixq_tpu.engine import InferenceEngine

        engine = InferenceEngine(self.params, self.cfg, self.specs,
                                 EngineConfig(max_seq_len=self.max_length))
        outs = []
        for req in requests:
            ctx, gen_kwargs = req.args
            ids = self.tokenizer(ctx).input_ids
            max_new = int(gen_kwargs.get("max_gen_toks", 128))
            toks = engine.generate([ids], max_new_tokens=max_new)[0]
            outs.append(self.tokenizer.decode(toks))
        return outs
