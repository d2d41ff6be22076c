"""Inference engine: jitted prefill/decode steps over a static KV cache.

Replaces the reference's serving story (HF `model.generate()` on mutated
modules, benchflops.py:82-133) with two compiled XLA programs:

  prefill(params, tokens[B,Tp], cache, kv_start) -> (last_logits, cache)
  decode (params, tokens[B,1],  cache)           -> (logits,      cache)

The KV cache is donated every step, so decode runs allocation-free; batch and
sequence are bucketed to keep shapes static (SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine.sampling import SamplingParams, sample
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache


from mixq_tpu.utils.shapes import round_up as _round_up


class InferenceEngine:
    """Single-program inference engine (multi-chip via sharded params/cache —
    the engine code is identical; GSPMD partitions the compiled steps)."""

    def __init__(
        self,
        params: DecoderParams,
        model_cfg: ModelConfig,
        specs: DecoderSpecs,
        engine_cfg: Optional[EngineConfig] = None,
        mesh=None,
    ):
        """If `mesh` (jax.sharding.Mesh with ('data','model') axes) is given,
        params are TP-sharded onto it and caches/token batches are sharded on
        the data axis — the single-chip and multi-chip engines are the same
        compiled program, partitioned by GSPMD."""
        self.engine_cfg = engine_cfg or EngineConfig()
        self.mesh = mesh
        if mesh is not None:
            from mixq_tpu.parallel.sharding import shard_decoder_params

            params = shard_decoder_params(params, mesh)
        self.params = params
        self.model_cfg = model_cfg
        self.specs = specs

        mc = model_cfg

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _step(params, tokens, cache, kv_start):
            logits, cache = forward(params, tokens, cache, specs, mc,
                                    kv_start, decode_mesh=mesh)
            return logits[:, -1, :], cache

        @functools.partial(jax.jit, static_argnums=(2,))
        def _sample(logits, key, sp: SamplingParams):
            return sample(logits, key, sp)

        # one jitted step serves prefill and decode (jit specializes per
        # token-chunk shape anyway)
        self._prefill = _step
        self._decode = _step
        self._sample = _sample

        # tail-window flush as its OWN compiled program: the decode step
        # never touches the main cache (KVCache docstring); the engine
        # calls this exactly when R tokens have been staged
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _flush(cache):
            return cache.flush_tail()

        self._flush = _flush

        self._decode_loops = {}

        # sequence-parallel (ring-attention) prefill step: context
        # parallelism over ring_prefill_axis for long fresh-cache prompts
        self._prefill_ring = None
        ring_axis = self.engine_cfg.ring_prefill_axis
        if mesh is not None and ring_axis and ring_axis in mesh.axis_names:
            tp = mesh.shape.get("model", 1)
            head_axis = ("model" if "model" in mesh.axis_names
                         and mc.num_attention_heads % tp == 0
                         and mc.num_key_value_heads % tp == 0 else None)

            @functools.partial(jax.jit, donate_argnums=(2,))
            def _step_ring(params, tokens, cache, kv_start):
                logits, cache = forward(
                    params, tokens, cache, specs, mc, kv_start,
                    ring_mesh=mesh, ring_axis=ring_axis,
                    ring_head_axis=head_axis)
                return logits[:, -1, :], cache

            self._prefill_ring = _step_ring

    def _flash_ok(self, max_seq: int) -> bool:
        """Head-major flash cache when the policy resolves to it (explicit
        "flash" opt-in, or "auto" on TPU when supported)."""
        from mixq_tpu.ops.pallas.flash_decode import use_head_major_cache

        return use_head_major_cache(
            self.specs.attn_impl, self.model_cfg, max_seq,
            jnp.dtype(self.engine_cfg.kv_dtype).itemsize)

    def _use_ring(self, T: int) -> bool:
        if self._prefill_ring is None or T < self.engine_cfg.ring_prefill_min_t:
            return False
        # shard_map needs the sequence to divide evenly over the ring axis
        return T % self.mesh.shape[self.engine_cfg.ring_prefill_axis] == 0

    def _get_decode_loop(self, max_steps: int, sp: SamplingParams,
                         want_lp: bool = False):
        """One-program multi-token decode: lax.while_loop over decode steps
        with on-device sampling and all-rows-EOS early exit — the TPU-native
        decode shape (the stepwise path syncs the host every token for the
        EOS check; through the relay that's a round-trip per token). Cached
        per (max_steps, sampling).

        With a tail-staged cache the loop runs in WINDOWS: each while
        iteration scans R decode steps then flushes the tail (flush_tail
        must run once per full window, outside the per-step graph —
        KVCache docstring). Early exit granularity becomes R steps; rows
        already done keep emitting eos into the (R-padded) buffer."""
        key_ = (max_steps, sp, want_lp)
        fn = self._decode_loops.get(key_)
        if fn is not None:
            return fn
        specs, mc = self.specs, self.model_cfg

        @functools.partial(jax.jit, donate_argnums=(2,))
        def loop(params, first_tok, cache, kv_start, key, eos_id):
            B = first_tok.shape[0]
            R = (cache.k_tail.shape[1] if cache.k_tail is not None
                 else 1)
            n_pad = -(-max_steps // R) * R
            buf = jnp.zeros((B, n_pad), jnp.int32)
            lp_buf = jnp.zeros((B, n_pad), jnp.float32)
            done = first_tok == eos_id

            def cond(c):
                step, _, _, _, _, _, done = c
                return (step < max_steps) & ~jnp.all(done)

            def one_step(c, _):
                step, buf, lp_buf, nxt, cache, key, done = c
                key, sub = jax.random.split(key)
                logits, cache = forward(params, nxt[:, None], cache, specs,
                                        mc, kv_start, decode_mesh=self.mesh)
                last = logits[:, -1, :]
                tok = sample(last, sub, sp)
                tok = jnp.where(done, eos_id, tok)
                done = done | (tok == eos_id)
                buf = buf.at[:, step].set(tok)
                if want_lp:     # static: baked out of the no-logprob trace
                    from mixq_tpu.engine.sampling import chosen_logprob

                    lp_buf = lp_buf.at[:, step].set(
                        chosen_logprob(last, jnp.maximum(tok, 0)))
                return (step + 1, buf, lp_buf, tok, cache, key, done), None

            def body(c):
                c, _ = jax.lax.scan(one_step, c, None, length=R)
                step, buf, lp_buf, nxt, cache, key, done = c
                if cache.k_tail is not None:
                    cache = cache.flush_tail()
                return (step, buf, lp_buf, nxt, cache, key, done)

            step, buf, lp_buf, _, cache, _, done = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32), buf, lp_buf,
                             first_tok, cache, key, done))
            return buf[:, :max_steps], lp_buf[:, :max_steps], step, cache

        self._decode_loops[key_] = loop
        return loop

    def new_cache(self, batch: int, max_seq: Optional[int] = None) -> KVCache:
        from mixq_tpu.ops.pallas.flash_decode import DEFAULT_TAIL_R

        mc = self.model_cfg
        S = max_seq or self.engine_cfg.max_seq_len
        hm = self._flash_ok(S)
        if hm:
            # the write-combining tail re-writes a whole R-window at its
            # aligned base each step, so the cache needs R slots of slack
            # past the last decoded position (layers.py KVCache docstring)
            S = -(-(S + DEFAULT_TAIL_R) // 128) * 128
        cache = KVCache.create(
            mc.num_hidden_layers, batch, S,
            mc.num_key_value_heads, mc.head_dim_,
            dtype=jnp.dtype(self.engine_cfg.kv_dtype),
            head_major=hm,
            # stage decode writes in the token-major tail (amortizes the
            # head-major single-token scatter; layers.py KVCache docstring)
            tail_r=DEFAULT_TAIL_R if hm else 0,
        )
        if self.mesh is not None:
            from mixq_tpu.parallel.sharding import shard_kv_cache

            cache = shard_kv_cache(cache, self.mesh)
        return cache

    def warmup_online(self, warmup_batches, sigma: float = 6.0,
                      max_steps: int = 2):
        """Run the online outlier predictor's warmup lifecycle (reference
        cache.stop warmup, linear.py:200-227): detect outlier channels on the
        given token batches, promote their weight rows to fp, freeze, and
        swap the engine's params. Returns {layer.slot: outlier_count}."""
        from mixq_tpu.quantize.online import warmup_online_outliers

        params, counts = warmup_online_outliers(
            self.params, self.model_cfg, self.specs, warmup_batches,
            sigma=sigma, max_steps=max_steps)
        if self.mesh is not None:
            from mixq_tpu.parallel.sharding import shard_decoder_params

            params = shard_decoder_params(params, self.mesh)
        self.params = params
        return counts

    # -- one-shot convenience API ------------------------------------------

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 128,
        sampling: SamplingParams = SamplingParams(),
        seed: int = 0,
        eos_token_id: Optional[int] = None,
        pad_token_id: int = 0,
        return_logprobs: bool = False,
    ) -> List[List[int]]:
        """Batched generation from token-id prompts. Prompts are left-padded
        to a common bucketed length; per-row `kv_start` masks the padding.
        return_logprobs=True returns (tokens, logprobs) lists instead —
        logprob of each chosen token from the raw distribution (inside
        the compiled program on the device-loop path; one extra gather
        per step on the stepwise path). The plain call pays nothing."""
        B = len(prompts)
        assert B > 0, "empty prompt batch"
        lens = [len(p) for p in prompts]
        assert min(lens) > 0, "prompts must contain at least one token"
        Tp = _round_up(max(lens), self.engine_cfg.prefill_chunk)
        Tp = min(Tp, self.engine_cfg.max_seq_len)
        assert max(lens) <= Tp, "prompt longer than max_seq_len"

        tokens = np.full((B, Tp), pad_token_id, np.int32)
        kv_start = np.zeros((B,), np.int32)
        for i, p in enumerate(prompts):
            tokens[i, Tp - len(p):] = p
            kv_start[i] = Tp - len(p)

        total = Tp + max_new_tokens
        cache = self.new_cache(B, _round_up(total, 128))
        kv_start_j = jnp.asarray(kv_start)

        step = self._prefill_ring if self._use_ring(Tp) else self._prefill
        logits, cache = step(
            self.params, jnp.asarray(tokens), cache, kv_start_j
        )

        from mixq_tpu.engine.sampling import chosen_logprob

        key = jax.random.PRNGKey(seed)
        next_tok = self._sample(logits, key, sampling)
        first_lp = (np.asarray(chosen_logprob(logits, next_tok))
                    if return_logprobs else None)

        if self.engine_cfg.device_decode_loop and max_new_tokens > 1:
            # one while_loop program: no host sync per token
            loop = self._get_decode_loop(max_new_tokens - 1, sampling,
                                         want_lp=return_logprobs)
            eos = -1 if eos_token_id is None else eos_token_id
            buf, lp_buf, _, cache = loop(self.params, next_tok, cache,
                                         kv_start_j, key,
                                         jnp.asarray(eos, jnp.int32))
            gen = np.concatenate(
                [np.asarray(next_tok)[:, None], np.asarray(buf)], axis=1)
            if return_logprobs:
                gen_lp = np.concatenate(
                    [first_lp[:, None], np.asarray(lp_buf)], axis=1)
        else:
            out_tokens = [np.asarray(next_tok)]
            out_lps = [first_lp]
            for step in range(1, max_new_tokens):
                key, sub = jax.random.split(key)
                logits, cache = self._decode(
                    self.params, next_tok[:, None], cache, kv_start_j
                )
                cache = self.flush_if_due(cache, step)
                next_tok = self._sample(logits, sub, sampling)
                host_tok = np.asarray(next_tok)
                out_tokens.append(host_tok)
                if return_logprobs:
                    out_lps.append(
                        np.asarray(chosen_logprob(logits, next_tok)))
                if eos_token_id is not None and bool(
                        np.all(host_tok == eos_token_id)):
                    break
            gen = np.stack(out_tokens, axis=1)  # [B, steps]
            if return_logprobs:
                gen_lp = np.stack(out_lps, axis=1)
        results = []
        lp_results = []
        for i in range(B):
            row = gen[i].tolist()
            if eos_token_id is not None and eos_token_id in row:
                row = row[: row.index(eos_token_id) + 1]
            results.append(row)
            if return_logprobs:
                lp_results.append(gen_lp[i, :len(row)].tolist())
        if return_logprobs:
            return results, lp_results
        return results

    # -- stepwise API (for benchmarking / continuous batching) -------------

    def prefill(self, tokens: jax.Array, cache: KVCache,
                kv_start: Optional[jax.Array] = None):
        """`cache` must be fresh (length 0) when the ring-prefill path is
        configured — sequence-parallel attention covers the chunk only."""
        if kv_start is None:
            kv_start = jnp.zeros((tokens.shape[0],), jnp.int32)
        step = (self._prefill_ring if self._use_ring(tokens.shape[1])
                else self._prefill)
        return step(self.params, tokens, cache, kv_start)

    def decode_step(self, tokens: jax.Array, cache: KVCache,
                    kv_start: Optional[jax.Array] = None):
        if kv_start is None:
            kv_start = jnp.zeros((tokens.shape[0],), jnp.int32)
        return self._decode(self.params, tokens, cache, kv_start)

    def flush_if_due(self, cache: KVCache, staged_steps: int) -> KVCache:
        """Flush the tail window when the `staged_steps`-th decode step
        just filled it. Stepwise drivers (generate, benchmarks) count
        decode steps from 1 and call this after every step; tail-less
        caches pass through untouched."""
        if cache.k_tail is None:
            return cache
        if staged_steps % cache.k_tail.shape[1] == 0:
            cache = self._flush(cache)
        return cache
