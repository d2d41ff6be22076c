"""Continuous batching engine: slot-based serving over a shared KV cache.

North-star requirement (BASELINE.json: "continuous batching across hosts");
the reference has nothing comparable (static batch, one generate() call).

Design: a fixed pool of `n_slots` KV-cache rows. Requests queue in the
(native C++) scheduler; all prompts admitted in a step share one bucketed
[k, Tp] prefill program and ONE scatter copies their KV rows into their
slots; every step() then runs ONE T=1 decode over all slots (inactive
slots compute garbage that is ignored — static shapes, no recompilation
as requests come and go). Per-slot positions flow through `slot_lengths`.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mixq_tpu.config import EngineConfig, ModelConfig
from mixq_tpu.engine.sampling import (SamplingParams, chosen_logprob,
                                      sample_per_slot)
from mixq_tpu.engine.scheduler import make_scheduler
from mixq_tpu.models.decoder import DecoderParams, DecoderSpecs, forward
from mixq_tpu.models.layers import KVCache
from mixq_tpu.ops.pallas.flash_decode import use_head_major_cache


from mixq_tpu.utils.shapes import round_up as _round_up


class ContinuousBatchingEngine:
    def __init__(
        self,
        params: DecoderParams,
        model_cfg: ModelConfig,
        specs: DecoderSpecs,
        engine_cfg: Optional[EngineConfig] = None,
        prefer_native_scheduler: bool = True,
        mesh=None,
    ):
        """`mesh`: optional (data, model) jax Mesh — params TP-shard onto it
        and the slot cache shards batch/heads; the serving loop is unchanged
        (GSPMD partitions the compiled steps)."""
        self.mesh = mesh
        self.ecfg = engine_cfg or EngineConfig()
        self._pp = self.ecfg.pipe_stages > 1
        if self._pp:
            # pipeline-parallel serving (EngineConfig.pipe_stages): every
            # engine program's forward is pipeline_forward over `mesh`'s
            # 'pipe' axis. Params are stage-stacked + placed per stage;
            # the cache stays batch-major (pipeline_forward's scope), so
            # attn resolves to the XLA path and windows carry the full
            # cache — the measured cost of serving batch-major is the PP
            # serving trade (PROFILE_r05).
            from mixq_tpu.parallel.pipeline import (pipeline_forward,
                                                    shard_stage_params,
                                                    stage_params)

            if mesh is None or "pipe" not in mesh.axis_names:
                raise ValueError(
                    "pipe_stages > 1 needs a mesh with a 'pipe' axis")
            if self.ecfg.spec_k > 1:
                raise ValueError("pipeline serving does not support "
                                 "speculation (spec_k > 1)")
            if model_cfg.sliding_window is not None or model_cfg.alibi:
                raise ValueError("pipeline serving: sliding-window/ALiBi "
                                 "models stay on the TP engine")
            params = shard_stage_params(
                stage_params(params, self.ecfg.pipe_stages), mesh,
                axis="pipe")

            def _pp_fwd(p, tokens, cache, specs_, mc, slot_lengths=None,
                        decode_mesh=None, kv_start=None):
                assert kv_start is None
                import math

                # microbatch count must divide the (static) batch: small
                # prefill buckets (k < n_stages) still pipeline, with
                # proportionally more bubble
                M = math.gcd(tokens.shape[0], self.ecfg.pipe_stages)
                return pipeline_forward(p, tokens, cache, specs_, mc,
                                        mesh=mesh, axis="pipe",
                                        microbatches=M,
                                        slot_lengths=slot_lengths)

            self._fwd = _pp_fwd
        else:
            if mesh is not None:
                from mixq_tpu.parallel.sharding import shard_decoder_params

                params = shard_decoder_params(params, mesh)
            self._fwd = forward
        self.params = params
        self.cfg = model_cfg
        self.specs = specs
        self.n_slots = self.ecfg.max_batch_size
        self.max_seq = self.ecfg.max_seq_len
        # spec engines reserve spec_k-1 trailing cache slots: a T=k verify
        # at slot_length s writes KV rows s..s+k-1, so budgets must keep
        # s <= max_seq - k — otherwise the final tokens of a cache-filling
        # request would be computed at clamped (wrong) positions
        sched_seq = self.max_seq - (self.ecfg.spec_k - 1
                                    if self.ecfg.spec_k > 1 else 0)
        self.sched = make_scheduler(self.n_slots, sched_seq,
                                    prefer_native_scheduler)

        mc, specs_ = model_cfg, specs
        fwd = self._fwd

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(params, tokens, cache, slot_lengths):
            logits, cache = fwd(params, tokens, cache, specs_, mc,
                                slot_lengths=slot_lengths,
                                decode_mesh=mesh)
            return logits[:, -1, :], cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _prefill(params, tokens, cache):
            # [k, Tc] prompt (continuation-)prefill into a small cache.
            # Returns ONLY the cache: the first decode step replays each
            # prompt's last token, so prefill logits are dead — returning
            # them forced XLA to keep the [k, Tp, V] f32 logits plus the
            # lm_head GEMM alive (2.1 GB + 134 GFLOP at k=64 Tp=256 7B,
            # the bulk of the slots=64 compile-OOM; VERDICT r3 item 2).
            # Dropping the output lets XLA DCE the whole readout.
            _, cache = fwd(params, tokens, cache, specs_, mc)
            return cache

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _insert(big: KVCache, small: KVCache, slots, new_lens) -> KVCache:
            """Copy a [L, k, Tp, ...] batched prefill's KV into rows
            `slots` of the pool. ONE scatter covers all k admissions:
            any write into the multi-GB cache is a whole-array pass
            (CLAUDE.md), so k separate row inserts would pay the pass k
            times."""
            Tp = small.max_seq

            def put(dst, src):
                # row axis is 1, or 2 for head-major flash caches; a
                # single advanced index keeps its dim in place
                src = src.astype(dst.dtype)
                if big.head_major:
                    return dst.at[:, :, slots, :src.shape[3]].set(src)
                return dst.at[:, slots, :src.shape[2]].set(src)

            big = big._replace(k=put(big.k, small.k), v=put(big.v, small.v))
            if big.quantized:
                # head-major scales are S-padded to 128 lanes per cache;
                # slice the small cache's pad down to the written span
                ksc, vsc = small.k_scale, small.v_scale
                if big.head_major:
                    ksc, vsc = ksc[..., :Tp], vsc[..., :Tp]
                big = big._replace(k_scale=put(big.k_scale, ksc),
                                   v_scale=put(big.v_scale, vsc))
            if big.k_tail is not None:
                # reused rows' tail windows restart at their new lengths
                # (stale tail slots land at masked positions until then)
                big = big._replace(
                    tail_base=big.tail_base.at[slots].set(new_lens))
            return big

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _flush(cache: KVCache, row_lengths) -> KVCache:
            return cache.flush_tail(row_lengths)

        @jax.jit
        def _sample_lp(logits, key, t, k, p):
            tok = sample_per_slot(logits, key, t, k, p)
            return tok, chosen_logprob(logits, tok)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _verify(params, tokens, cache, slot_lengths, key, t, k, p):
            """Speculative-verify step: one T=spec_k forward over all
            slots (row b's tokens at positions slot_lengths[b]..+k-1).
            Returns per-position greedy continuations + their logprobs
            (the greedy rows' acceptance material) and the position-0
            per-slot sample (what a plain decode step would emit — so
            sampled rows ride the same program)."""
            logits, cache = fwd(params, tokens, cache, specs_, mc,
                                slot_lengths=slot_lengths,
                                decode_mesh=mesh)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B,k]
            lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            pred_lp = jnp.take_along_axis(
                lsm, preds[..., None], axis=-1)[..., 0]            # [B,k]
            s_tok = sample_per_slot(logits[:, 0], key, t, k, p)
            s_lp = chosen_logprob(logits[:, 0], s_tok)
            return preds, pred_lp, s_tok, s_lp, cache

        self._verify = _verify
        self._sample_lp = _sample_lp
        self._decode = _decode
        self._prefill = _prefill
        self._insert = _insert
        self._flush = _flush
        self._steps_since_flush = 0
        self._windows: Dict = {}
        # lag-1 async-window state (step_window_async): the in-flight
        # window's (device handles, dispatch-time slot->rid map), the
        # device-carried (cur_tokens, lengths) for the next dispatch, and
        # the slots whose carries must be overridden from host state
        # because admission rewrote them since the last dispatch
        self._async_inflight = None
        self._async_carry = None
        self._async_overrides: set = set()
        # eos_token_id of the most recent step_window_async dispatch: the
        # in-flight window was SAMPLED under that stopping contract, so a
        # later drain (snapshot(), a mode switch via step()) must apply
        # the same EOS when it processes the window — otherwise restore
        # decodes past EOS to the budget (ADVICE r4).
        self._async_eos: Optional[int] = None

        hm = use_head_major_cache(
            specs_.attn_impl, mc, self.max_seq,
            jnp.dtype(self.ecfg.kv_dtype).itemsize)
        if self._pp:
            hm = False      # pipeline_forward's scope is batch-major
        if self.ecfg.spec_k > 1:
            # speculative verify is a T=k mid-sequence slot write.
            # Batch-major caches take it as a direct span scatter;
            # head-major (flash) pools stage the k verify tokens in the
            # per-row tail window and the kernel's tail attend covers
            # them (KVCache._update_tail_slots / decoder.attend_over) —
            # so speculation composes with the int8-flash serving
            # default (VERDICT r4 item 3). Per-row ring wraps and the
            # stacked scan body still don't serve it.
            if mc.sliding_window is not None:
                raise ValueError(
                    "spec_k > 1 does not support sliding-window models")
            if params.stacked is not None:
                raise ValueError(
                    "spec_k > 1 needs per-layer params (the stacked scan "
                    "body's slot write is T=1-shaped)")
        from mixq_tpu.ops.pallas.flash_decode import DEFAULT_TAIL_R

        self._window_r = self.ecfg.window_r or DEFAULT_TAIL_R
        # tail window depth: plain windows stage <= R tokens per row per
        # dispatch; a spec window's R rounds stage up to spec_k each
        # (all-accept worst case), so the tail must hold
        # spec_window_r * spec_k before the end-of-window flush
        tail_r = self._window_r
        if self.ecfg.spec_k > 1:
            tail_r = max(tail_r,
                         self.ecfg.spec_window_r * self.ecfg.spec_k,
                         self.ecfg.spec_k)
        self.cache = KVCache.create(
            mc.num_hidden_layers, self.n_slots, self.max_seq,
            mc.num_key_value_heads, mc.head_dim_,
            jnp.dtype(self.ecfg.kv_dtype),
            head_major=hm,
            # per-row staged windows: decode never scatters into the big
            # cache; step() flushes every R steps (layers.py KVCache)
            tail_r=tail_r if hm else 0, per_row_tail=True)
        if mesh is not None and self._pp:
            # each stage holds only its own layers' KV (leaf dim 0 = L)
            from jax.sharding import NamedSharding, PartitionSpec as P

            put = lambda a: jax.device_put(
                a, NamedSharding(mesh, P("pipe")))
            self.cache = self.cache._replace(
                k=put(self.cache.k), v=put(self.cache.v),
                k_scale=(put(self.cache.k_scale)
                         if self.cache.quantized else self.cache.k_scale),
                v_scale=(put(self.cache.v_scale)
                         if self.cache.quantized else self.cache.v_scale))
        elif mesh is not None:
            from mixq_tpu.parallel.sharding import shard_kv_cache

            self.cache = shard_kv_cache(self.cache, mesh)
        self.lengths = np.zeros((self.n_slots,), np.int32)
        self.cur_tokens = np.zeros((self.n_slots,), np.int32)
        self._prompts: Dict[int, List[int]] = {}
        self._req_budget: Dict[int, int] = {}
        self._req_sampling: Dict[int, Optional[SamplingParams]] = {}
        self._slot_sampling: Dict[int, Optional[SamplingParams]] = {}
        self._req_stop: Dict[int, frozenset] = {}
        self._slot_stop: Dict[int, frozenset] = {}
        self._outputs: Dict[int, List[int]] = {}
        self._logprobs: Dict[int, List[float]] = {}
        self._done: Dict[int, List[int]] = {}
        self._done_logprobs: Dict[int, List[float]] = {}
        self._slot_req: Dict[int, int] = {}
        # per-slot token histories for speculative drafting (native flat
        # scan when the C++ lib is built; Python fallback otherwise)
        if self.ecfg.spec_k > 1:
            from mixq_tpu.engine.scheduler import make_drafter

            self._drafter = make_drafter(self.n_slots,
                                         prefer_native_scheduler)
            # device-window drafting state (host mirror of the on-device
            # history; rewritten per admit, synced back per window)
            self._hist_np = np.zeros((self.n_slots, self.max_seq), np.int32)
            self._hlen_np = np.zeros((self.n_slots,), np.int32)
        else:
            self._drafter = None
            self._hist_np = None
            self._hlen_np = None
        self._next_id = 0
        self._key = jax.random.PRNGKey(0)
        self._sampling_dev = None     # cached per-slot sampling arrays
        self.spec_stats = {"forwards": 0, "drafted": 0, "accepted": 0,
                           "emitted": 0}
        # adaptive-speculation state (step_serve): current mode, rolling
        # per-window gain, plain-windows-since-probe counter, and the
        # per-slot prompts needed to resync device histories on re-probe
        self._spec_mode = "spec"
        self._spec_gains: List[float] = []
        self._plain_since_probe = 0
        self._slot_prompt: Dict[int, List[int]] = {}
        self._last_spec_gain = 1.0

    # -- request API -------------------------------------------------------

    def add_request(self, prompt: Sequence[int], max_new_tokens: int,
                    sampling: Optional[SamplingParams] = None,
                    stop_token_ids: Optional[Sequence[int]] = None) -> int:
        """`sampling`: per-REQUEST sampling config; None inherits the
        step-level default. Heterogeneous batches (greedy rows next to
        temperature rows) run in the same compiled step.
        `stop_token_ids`: per-REQUEST stop set — the request finishes
        when any of them is emitted (the stop token is kept in the
        output, like EOS)."""
        rid = self._next_id
        self._next_id += 1
        rc = self.sched.add_request(rid, len(prompt), max_new_tokens)
        if rc != 0:
            raise ValueError(f"request rejected (code {rc}): "
                             f"prompt_len={len(prompt)} max_seq={self.max_seq}")
        self._prompts[rid] = list(prompt)
        self._req_budget[rid] = int(max_new_tokens)   # for snapshot/restore
        self._req_sampling[rid] = sampling
        self._req_stop[rid] = (frozenset(stop_token_ids)
                               if stop_token_ids else frozenset())
        self._outputs[rid] = []
        self._logprobs[rid] = []
        return rid

    def _sampling_arrays(self, default: SamplingParams):
        """Per-slot (temperature, top_k, top_p) DEVICE arrays: each slot
        carries its request's params, defaulting to the step-level
        config. Cached between steps (three host->device transfers per
        token otherwise); slot churn invalidates via _slot_sampling
        mutations setting _sampling_dev = None."""
        if (self._sampling_dev is not None
                and self._sampling_dev[0] == default):
            return self._sampling_dev[1]
        t = np.full((self.n_slots,), default.temperature, np.float32)
        k = np.full((self.n_slots,), default.top_k, np.int32)
        p = np.full((self.n_slots,), default.top_p, np.float32)
        for slot, sp in self._slot_sampling.items():
            if sp is not None:
                t[slot], k[slot], p[slot] = sp.temperature, sp.top_k, sp.top_p
        arrays = (jnp.asarray(t), jnp.asarray(k), jnp.asarray(p))
        self._sampling_dev = (default, arrays)
        return arrays

    def finished(self) -> Dict[int, List[int]]:
        """Pop finished request outputs."""
        out, self._done = self._done, {}
        self._done_logprobs = {}     # populated in lockstep with _done
        return out

    def finished_records(self) -> Dict[int, Dict[str, list]]:
        """Pop finished requests with per-token logprobs:
        {rid: {"tokens": [...], "logprobs": [...]}} (logprob = log-softmax
        of the RAW distribution at the chosen token, the standard serving
        report)."""
        out, self._done = self._done, {}
        lps, self._done_logprobs = self._done_logprobs, {}
        return {r: {"tokens": t, "logprobs": lps.get(r, [])}
                for r, t in out.items()}

    @property
    def has_work(self) -> bool:
        s = self.sched.stats()
        return s["queued"] > 0 or s["active"] > 0

    # -- state snapshot / restore (failure recovery) ------------------------

    _CACHE_FIELDS = ("k", "v", "k_scale", "v_scale", "length",
                     "k_tail", "v_tail", "kt_scale", "vt_scale", "tail_base")

    def snapshot(self, path: str) -> None:
        """Persist the pool's COMPLETE serving state — KV cache, per-slot
        scheduler state, in-flight outputs, queued requests, sampling
        state, PRNG key — so a crashed/migrated server resumes exactly
        where it stopped (SURVEY §5 failure-recovery: "re-loadable engine
        state"; the reference has nothing — OOM is reported as a bench
        result, benchflops.py:208-213). Call BETWEEN windows (the engine's
        scheduling quantum); restore() continues bit-identically for
        greedy rows and reproducibly for sampled rows (the PRNG key is
        part of the state)."""
        self.drain_async()
        import dataclasses as _dc
        import json as _json

        os.makedirs(path, exist_ok=True)
        arrays = {"lengths": self.lengths, "cur_tokens": self.cur_tokens}
        if self._hist_np is not None:
            arrays["hist"] = self._hist_np
            arrays["hlen"] = self._hlen_np
        for f in self._CACHE_FIELDS:
            a = getattr(self.cache, f)
            if a is not None:
                arrays[f"cache_{f}"] = np.asarray(jax.device_get(a))
        np.savez(os.path.join(path, "state.npz"), **arrays)

        def sp(v):
            return None if v is None else _dc.asdict(v)

        active = []
        for slot in self.sched.active_slots():
            rid, plen, gen, mnt = map(int, self.sched.slot_info(slot))
            active.append({
                "slot": int(slot), "rid": rid, "prompt_len": plen,
                "generated": gen, "max_new": mnt,
                "outputs": [int(t) for t in self._outputs.get(rid, [])],
                "logprobs": [float(x) for x in self._logprobs.get(rid, [])],
                "sampling": sp(self._slot_sampling.get(slot)),
                "stop": sorted(self._slot_stop.get(slot, ())),
                "prompt": self._slot_prompt.get(slot),
            })
        queued = [{
            "rid": int(rid), "prompt": self._prompts[rid],
            "budget": self._req_budget.get(rid, self.max_seq),
            "sampling": sp(self._req_sampling.get(rid)),
            "stop": sorted(self._req_stop.get(rid, ())),
        } for rid in self._prompts]
        meta = {
            "active": active, "queued": queued,
            "next_id": self._next_id,
            "done": {str(k): v for k, v in self._done.items()},
            "done_logprobs": {str(k): v
                              for k, v in self._done_logprobs.items()},
            "key": np.asarray(jax.device_get(self._key)).tolist(),
            "steps_since_flush": self._steps_since_flush,
            "spec_stats": self.spec_stats,
            "spec_mode": self._spec_mode,
            "n_slots": self.n_slots, "max_seq": self.max_seq,
            "kv_dtype": str(self.ecfg.kv_dtype),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            _json.dump(meta, f)

    @classmethod
    def restore(cls, path: str, params, model_cfg, specs,
                engine_cfg=None, prefer_native_scheduler: bool = True,
                mesh=None) -> "ContinuousBatchingEngine":
        """Rebuild a pool from snapshot(); the engine/cache config must
        match the snapshotting engine's (asserted by shape/dtype)."""
        import json as _json

        from mixq_tpu.engine.sampling import SamplingParams

        eng = cls(params, model_cfg, specs, engine_cfg,
                  prefer_native_scheduler=prefer_native_scheduler,
                  mesh=mesh)
        data = np.load(os.path.join(path, "state.npz"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = _json.load(f)
        assert meta["n_slots"] == eng.n_slots and \
            meta["max_seq"] == eng.max_seq, "engine config mismatch"

        new_fields = {}
        for f in cls._CACHE_FIELDS:
            t = getattr(eng.cache, f)
            if t is None:
                continue
            a = data[f"cache_{f}"]
            assert a.shape == t.shape and a.dtype.itemsize == t.dtype.itemsize, \
                f"cache field {f}: snapshot {a.shape}/{a.dtype} vs engine " \
                f"{t.shape}/{t.dtype}"
            if a.dtype != t.dtype:      # npz stores bf16 as void ("|V2")
                a = a.view(t.dtype)
            new_fields[f] = jax.device_put(jnp.asarray(a), t.sharding)
        eng.cache = eng.cache._replace(**new_fields)
        eng.lengths = data["lengths"].copy()
        eng.cur_tokens = data["cur_tokens"].copy()
        if eng._hist_np is not None and "hist" in data:
            eng._hist_np = data["hist"].copy()
            eng._hlen_np = data["hlen"].copy()

        def unsp(d):
            return None if d is None else SamplingParams(**d)

        for s in meta["active"]:
            slot, rid = s["slot"], s["rid"]
            rc = eng.sched.restore_slot(slot, rid, s["prompt_len"],
                                        s["max_new"], s["generated"])
            assert rc == 0, f"restore_slot({slot}) -> {rc}"
            eng._slot_req[slot] = rid
            eng._outputs[rid] = list(s["outputs"])
            eng._logprobs[rid] = list(s["logprobs"])
            eng._slot_sampling[slot] = unsp(s["sampling"])
            eng._slot_stop[slot] = frozenset(s["stop"])
            if s["prompt"] is not None:
                eng._slot_prompt[slot] = list(s["prompt"])
            if eng._drafter is not None and eng._hlen_np is not None:
                hl = int(eng._hlen_np[slot])
                eng._drafter.reset(slot, eng._hist_np[slot, :hl].tolist())
        for q in meta["queued"]:
            eng._next_id = q["rid"]       # preserve original request ids
            got = eng.add_request(q["prompt"], q["budget"],
                                  sampling=unsp(q["sampling"]),
                                  stop_token_ids=q["stop"] or None)
            assert got == q["rid"]
        eng._next_id = meta["next_id"]
        eng._done = {int(k): v for k, v in meta["done"].items()}
        eng._done_logprobs = {int(k): v
                              for k, v in meta["done_logprobs"].items()}
        eng._key = jnp.asarray(np.asarray(meta["key"], np.uint32))
        eng._steps_since_flush = meta["steps_since_flush"]
        eng.spec_stats = meta["spec_stats"]
        eng._spec_mode = meta["spec_mode"]
        eng._sampling_dev = None
        return eng

    def warmup(self, prompt_buckets: Optional[Sequence[int]] = None,
               group_sizes: Optional[Sequence[int]] = None,
               analyze: bool = False) -> int:
        """Pre-compile the serving program set — decode step, decode
        window, and the (k, Tp) prefill/insert buckets — so no request
        ever pays a compile (XLA compiles cost minutes at 7B on this
        stack). Returns the number of programs compiled. Defaults:
        prefill-chunk multiples up to max_seq, power-of-two group sizes
        up to the pool size.

        analyze=True prints each program's AOT memory_analysis (temp /
        argument / output / aliased bytes) to stderr — the capacity-
        frontier instrument (PROFILE_r05 §2.2): the engine's RESIDENT
        set is params + pool (shared arguments) + each live program's
        un-aliased outputs and temps, and runtime ResourceExhausted at
        large slot counts is diagnosed by summing exactly these."""
        import math

        if prompt_buckets is None:
            prompt_buckets = list(range(self.ecfg.prefill_chunk,
                                        self.max_seq + 1,
                                        self.ecfg.prefill_chunk))
            if prompt_buckets[-1] != self.max_seq:
                # _admit_many clamps Tp to max_seq, so that bucket is
                # reachable even when it's not a chunk multiple
                prompt_buckets.append(self.max_seq)
        if group_sizes is None:
            group_sizes = [1 << i for i in
                           range(math.ceil(math.log2(self.n_slots)) + 1)
                           ] if self.n_slots > 1 else [1]
        n = 0

        def aval(shape, dtype):
            return jax.ShapeDtypeStruct(shape, dtype)

        def _c(name, lowered):
            compiled = lowered.compile()
            if analyze:
                import sys as _sys
                try:
                    ma = compiled.memory_analysis()
                    g = 1 / (1 << 30)
                    print(f"# memprobe {name}: "
                          f"temp={ma.temp_size_in_bytes * g:.3f}G "
                          f"args={ma.argument_size_in_bytes * g:.3f}G "
                          f"out={ma.output_size_in_bytes * g:.3f}G "
                          f"alias={ma.alias_size_in_bytes * g:.3f}G",
                          file=_sys.stderr)
                except Exception as e:  # relay variance: never fail warmup
                    print(f"# memprobe {name}: unavailable ({e})",
                          file=_sys.stderr)
            return compiled

        def cache_aval(x):
            # meshed pools serve a COMMITTED sharded cache; lowering with
            # sharding-free avals would compile executables the serving
            # path never hits
            if self.mesh is not None:
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        prefilled = set()
        for Tp in prompt_buckets:
            for k in group_sizes:
                # the exact (Tc, small_seq) plan _admit_many will execute
                # (chunked prefills reuse one (k, Tc) program per plan)
                Tc, Tp_pad, small_seq = self._prefill_plan(k, Tp)
                small = KVCache.create(
                    self.cfg.num_hidden_layers, k, small_seq,
                    self.cfg.num_key_value_heads, self.cfg.head_dim_,
                    jnp.dtype(self.ecfg.kv_dtype),
                    head_major=self.cache.head_major)
                small_avals = jax.tree.map(
                    lambda x: aval(x.shape, x.dtype), small)
                if (k, Tc, small_seq) not in prefilled:
                    prefilled.add((k, Tc, small_seq))
                    _c(f"prefill[k={k},Tc={Tc}]", self._prefill.lower(
                        self.params, aval((k, Tc), jnp.int32),
                        small_avals))
                    n += 1
                small = self._cut_small(small, Tp)
                small_avals = jax.tree.map(
                    lambda x: aval(x.shape, x.dtype), small)
                _c(f"insert[k={k},Tp={Tp}]", self._insert.lower(
                    jax.tree.map(cache_aval, self.cache),
                    small_avals, aval((k,), jnp.int32),
                    aval((k,), jnp.int32)))
                n += 1
        cache_avals = jax.tree.map(cache_aval, self.cache)
        _c("decode", self._decode.lower(
            self.params, aval((self.n_slots, 1), jnp.int32), cache_avals,
            aval((self.n_slots,), jnp.int32)))
        n += 1
        if self.ecfg.spec_k > 1:
            _c("verify", self._verify.lower(
                self.params, aval((self.n_slots, self.ecfg.spec_k),
                                  jnp.int32),
                cache_avals, aval((self.n_slots,), jnp.int32),
                aval((2,), jnp.uint32), aval((self.n_slots,), jnp.float32),
                aval((self.n_slots,), jnp.int32),
                aval((self.n_slots,), jnp.float32)))
            n += 1
            if self.ecfg.device_decode_loop:
                spec_win, _ = self._get_spec_window()
                _c("spec_window", spec_win.lower(
                    self.params, aval((self.n_slots,), jnp.int32),
                    cache_avals, aval((self.n_slots,), jnp.int32),
                    aval(self._hist_np.shape, jnp.int32),
                    aval((self.n_slots,), jnp.int32),
                    aval((self.n_slots,), jnp.bool_),
                    aval((2,), jnp.uint32),
                    aval((self.n_slots,), jnp.float32),
                    aval((self.n_slots,), jnp.int32),
                    aval((self.n_slots,), jnp.float32)))
                n += 1
        if self.ecfg.spec_k <= 1 or (self.ecfg.spec_adaptive
                                     and self.ecfg.device_decode_loop):
            # plain window: the serving program for non-spec engines AND
            # the fallback program adaptive speculation switches to when
            # the measured gain doesn't cover the T=spec_k verify cost
            window, _ = self._get_window()
            _c("window", window.lower(
                self.params, aval((self.n_slots,), jnp.int32), cache_avals,
                aval((self.n_slots,), jnp.int32),
                aval((self.n_slots,), jnp.bool_), aval((2,), jnp.uint32),
                aval((self.n_slots,), jnp.float32),
                aval((self.n_slots,), jnp.int32),
                aval((self.n_slots,), jnp.float32)))
            n += 1
        if self.cache.k_tail is not None:
            _c("flush", self._flush.lower(cache_avals,
                              aval((self.n_slots,), jnp.int32)))
            n += 1
        return n

    # -- one serving step --------------------------------------------------

    def step(self, sampling: SamplingParams = SamplingParams()) -> int:
        """Admit + prefill pending requests, then one decode step for all
        active slots. Returns number of active slots stepped."""
        self.drain_async()
        admits = self.sched.admit()
        if admits:
            self._admit_many(admits)

        active = self.sched.active_slots()
        if not active:
            return 0

        active_np = np.zeros((self.n_slots,), bool)
        active_np[active] = True

        logits, self.cache = self._decode(
            self.params, jnp.asarray(self.cur_tokens[:, None]),
            self.cache, jnp.asarray(self.lengths))
        self._key, sub = jax.random.split(self._key)
        toks_d, lp_d = self._sample_lp(
            logits, sub, *self._sampling_arrays(sampling))
        nxt, lp = np.asarray(toks_d), np.asarray(lp_d)

        # only active slots advance / record
        self.lengths[active_np] += 1
        if self.cache.k_tail is not None:
            self._steps_since_flush += 1
            if self._steps_since_flush >= self.cache.k_tail.shape[1]:
                self.cache = self._flush(self.cache,
                                         jnp.asarray(self.lengths))
                self._steps_since_flush = 0
        self.cur_tokens[active_np] = nxt[active_np]
        for slot in active:
            rid = self._slot_req[slot]
            tok = int(nxt[slot])
            self._outputs[rid].append(tok)
            self._logprobs[rid].append(float(lp[slot]))
            state = self.sched.on_token(slot)
            if state == 1:
                self._finish_request(slot, rid)
            elif tok in self._slot_stop.get(slot, ()):
                self.finish_slot(slot)
        return len(active)

    # -- speculative decoding ------------------------------------------------

    def step_spec(self, sampling: SamplingParams = SamplingParams(),
                  eos_token_id: Optional[int] = None) -> int:
        """One speculative serving step: admit, then a T=spec_k verify
        forward over all slots. Greedy slots feed [cur_token, n-gram
        draft...] and emit the greedy continuation's matching prefix + 1
        (bit-identical to plain greedy decode — the model's own argmax
        decides acceptance; see engine/speculative.py); sampled slots and
        slots with no draft emit one token, exactly like step(). Returns
        the number of active slots."""
        k = self.ecfg.spec_k
        assert k > 1, "step_spec needs EngineConfig.spec_k > 1"

        self.drain_async(eos_token_id)
        admits = self.sched.admit()
        if admits:
            self._admit_many(admits)
        active = self.sched.active_slots()
        if not active:
            return 0
        if self.cache.k_tail is not None and self._steps_since_flush:
            # plain steps staged tokens since the last flush; reset the
            # window so the verify span (k tokens/row) is sure to fit
            self.cache = self._flush(self.cache, jnp.asarray(self.lengths))
            self._steps_since_flush = 0

        feed = np.zeros((self.n_slots, k), np.int32)
        feed[:, 0] = self.cur_tokens
        drafts: Dict[int, List[int]] = {}
        for slot in active:
            sp = self._slot_sampling.get(slot) or sampling
            if sp.temperature > 0.0:
                continue                     # sampled row: no draft
            draft = self._drafter.propose(slot, self.ecfg.spec_ngram, k - 1)
            if draft:
                feed[slot, 1:1 + len(draft)] = draft
                drafts[slot] = draft

        active_np = np.zeros((self.n_slots,), bool)
        active_np[active] = True
        self._key, sub = jax.random.split(self._key)
        preds_d, plp_d, s_tok_d, s_lp_d, self.cache = self._verify(
            self.params, jnp.asarray(feed), self.cache,
            jnp.asarray(self.lengths), sub,
            *self._sampling_arrays(sampling))
        preds = np.asarray(preds_d)          # [n_slots, k]
        plp = np.asarray(plp_d)
        s_tok = np.asarray(s_tok_d)
        s_lp = np.asarray(s_lp_d)
        self.spec_stats["forwards"] += 1

        for slot in active:
            rid = self._slot_req[slot]
            sp = self._slot_sampling.get(slot) or sampling
            draft = drafts.get(slot, [])
            if sp.temperature > 0.0:
                emitted = [(int(s_tok[slot]), float(s_lp[slot]))]
            else:
                a = 0
                while a < len(draft) and int(preds[slot, a]) == draft[a]:
                    a += 1
                # emitted greedy tokens are preds[:a+1] — the model's own
                # continuation after each accepted prefix (position j's
                # argmax consumed feed[:j+1])
                emitted = [(int(preds[slot, j]), float(plp[slot, j]))
                           for j in range(a + 1)]
                self.spec_stats["drafted"] += len(draft)
                self.spec_stats["accepted"] += a
            self.spec_stats["emitted"] += len(emitted)
            kept = []
            finished = False
            for tok, lp in emitted:
                kept.append(tok)
                self._outputs[rid].append(tok)
                self._logprobs[rid].append(float(lp))
                self.lengths[slot] += 1
                self.cur_tokens[slot] = tok
                state = self.sched.on_token(slot)
                if state == 1:               # budget: drop any remainder
                    self._finish_request(slot, rid)
                    finished = True
                    break
                if (tok in self._slot_stop.get(slot, ())
                        or (eos_token_id is not None
                            and tok == eos_token_id)):
                    self.finish_slot(slot)
                    finished = True
                    break
            if not finished:
                self._drafter.append(slot, kept)
        if self.cache.k_tail is not None:
            # the verify staged k tokens per row; flush with the UPDATED
            # host lengths so accepted tokens land under tail_base and
            # rejected slots are stale-masked — occupancy resets to 0
            self.cache = self._flush(self.cache, jnp.asarray(self.lengths))
        return len(active)

    def _get_spec_window(self):
        """spec_window_r rounds of draft+verify+accept as ONE compiled
        program: the n-gram drafter runs ON DEVICE against a per-slot
        history buffer (speculative.propose_ngram_device), the verify
        forward is the same T=spec_k program step_spec uses, and the
        acceptance/emission/history updates are all in-scan — so the
        host pays one dispatch + fetch per R verify forwards instead of
        one per forward (through the relay that round-trip is ~100ms,
        which dominated step_spec's per-forward cost at serving batch)."""
        fn = self._windows.get("spec_window")
        if fn is not None:
            return fn
        from mixq_tpu.engine.speculative import (accept_greedy,
                                                 propose_ngram_device)

        specs_, mc = self.specs, self.cfg
        k = self.ecfg.spec_k
        n = self.ecfg.spec_ngram
        R = self.ecfg.spec_window_r
        noise = float(self.ecfg.spec_draft_noise)
        S = self.max_seq
        H = self._hist_np.shape[1]
        nb = self.n_slots
        mesh = self.mesh

        @functools.partial(jax.jit, donate_argnums=(2,))
        def spec_window(params, cur_tokens, cache, lengths, hist, hlen,
                        active, key, temp, topk, topp):
            greedy = temp <= 0.0
            # tail-staged (flash) pools: verify steps mutate ONLY the 4
            # tail arrays, so the scan carries just the tails and closes
            # over the main cache (the r4 boundary-copy lesson —
            # _get_window's comment); the tail is sized
            # spec_window_r * spec_k so all R rounds' spans fit before
            # the end-of-window flush
            staged = cache.k_tail is not None

            def one(c, _):
                if staged:
                    cur, tails, lengths, hist, hlen, key = c
                    cache_s = cache._replace(
                        k_tail=tails[0], v_tail=tails[1],
                        kt_scale=tails[2], vt_scale=tails[3])
                else:
                    cur, cache_s, lengths, hist, hlen, key = c
                key, sub = jax.random.split(key)
                draft, dlen = propose_ngram_device(hist, hlen, n, k - 1)
                dlen = jnp.where(greedy & active, dlen, 0)
                if noise > 0.0:
                    # acceptance-curve instrument (EngineConfig.
                    # spec_draft_noise): corrupt drafted tokens with
                    # prob `noise` — they still ride the verify forward
                    # and stage KV (the true mis-draft cost), and the
                    # model's argmax rejects them, so per-token
                    # acceptance ~= 1 - noise. Emitted tokens stay the
                    # model's own continuations (bit-identical output).
                    key, nk = jax.random.split(key)
                    flip = jax.random.bernoulli(nk, noise, draft.shape)
                    draft = jnp.where(flip, (draft + 1) % mc.vocab_size,
                                      draft)
                feed = jnp.concatenate([cur[:, None], draft], axis=1)
                logits, cache_s = self._fwd(params, feed, cache_s, specs_,
                                            mc, slot_lengths=lengths,
                                            decode_mesh=mesh)
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                lsm = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                plp = jnp.take_along_axis(
                    lsm, preds[..., None], axis=-1)[..., 0]
                s_tok = sample_per_slot(logits[:, 0], sub, temp, topk, topp)
                s_lp = chosen_logprob(logits[:, 0], s_tok)
                a = accept_greedy(preds[:, :k - 1], draft, dlen)
                e = jnp.where(greedy, a + 1, 1)
                e = jnp.where(active, e, 0).astype(jnp.int32)
                emitted = jnp.where(
                    greedy[:, None], preds,
                    jnp.concatenate([s_tok[:, None], preds[:, 1:]], axis=1))
                elp = jnp.where(
                    greedy[:, None], plp,
                    jnp.concatenate([s_lp[:, None], plp[:, 1:]], axis=1))
                last = jnp.take_along_axis(
                    emitted, jnp.clip(e - 1, 0, k - 1)[:, None], axis=1)[:, 0]
                cur = jnp.where(e > 0, last, cur)
                # append emitted tokens to the history (out-of-range ->
                # dropped; a full history just stops drafting)
                pos = hlen[:, None] + jnp.arange(k)[None, :]
                valid = (jnp.arange(k)[None, :] < e[:, None]) & (pos < H)
                pos = jnp.where(valid, pos, H)
                bi = jnp.broadcast_to(jnp.arange(nb)[:, None], pos.shape)
                hist = hist.at[bi, pos].set(emitted, mode="drop")
                hlen = jnp.minimum(hlen + e, H)
                # clamp: the NEXT verify writes k KV rows at lengths..+k-1
                lengths = jnp.minimum(lengths + e, S - k)
                cc = ((cache_s.k_tail, cache_s.v_tail, cache_s.kt_scale,
                       cache_s.vt_scale) if staged else cache_s)
                return ((cur, cc, lengths, hist, hlen, key),
                        (emitted, elp, e, dlen))

            init = ((cache.k_tail, cache.v_tail, cache.kt_scale,
                     cache.vt_scale) if staged else cache)
            carry = (cur_tokens, init, lengths, hist, hlen, key)
            (cur, cc, lengths, hist, hlen, key), \
                (toks, lps, cnts, dlens) = jax.lax.scan(
                    one, carry, None, length=R)
            if staged:
                cache = cache._replace(
                    k_tail=cc[0], v_tail=cc[1],
                    kt_scale=cc[2], vt_scale=cc[3])
                if self.ecfg.fold_flush:
                    cache = cache.flush_tail(lengths)
            else:
                cache = cc
            return toks, lps, cnts, dlens, cache, hist, hlen

        self._windows["spec_window"] = (spec_window, R)
        return spec_window, R

    def step_spec_window(self, sampling: SamplingParams = SamplingParams(),
                         eos_token_id: Optional[int] = None) -> int:
        """Admit, then run spec_window_r speculative rounds on device in
        one dispatch (the spec counterpart of step_window — same
        discard-after-finish and boundary-admission semantics; greedy
        rows stay bit-identical to plain greedy decode). Returns the
        number of slots active in the window."""
        self.drain_async(eos_token_id)
        admits = self.sched.admit()
        if admits:
            self._admit_many(admits)
        active = self.sched.active_slots()
        if not active:
            return 0
        active_np = np.zeros((self.n_slots,), bool)
        active_np[active] = True
        self._key, sub = jax.random.split(self._key)
        fn, R = self._get_spec_window()
        toks, lps, cnts, dlens, self.cache, hist_d, hlen_d = fn(
            self.params, jnp.asarray(self.cur_tokens), self.cache,
            jnp.asarray(self.lengths), jnp.asarray(self._hist_np),
            jnp.asarray(self._hlen_np), jnp.asarray(active_np), sub,
            *self._sampling_arrays(sampling))
        toks = np.asarray(toks)                    # [R, n_slots, k]
        lps = np.asarray(lps)
        cnts = np.asarray(cnts)                    # [R, n_slots]
        dlens = np.asarray(dlens)
        # np.array (copy): asarray views of device buffers are read-only,
        # and _admit_many writes reused slots' history rows in place
        self._hist_np = np.array(hist_d)
        self._hlen_np = np.array(hlen_d)
        self.spec_stats["forwards"] += R
        # speculative gain this window: device-emitted tokens per
        # (verify forward x active row); 1.0 == plain decode's rate
        self._last_spec_gain = float(cnts.sum()) / max(R * len(active), 1)

        running = set(active)
        for r in range(R):
            if not running:
                break
            for slot in list(running):
                rid = self._slot_req[slot]
                e = int(cnts[r, slot])
                sp = self._slot_sampling.get(slot) or sampling
                if sp.temperature <= 0.0:
                    self.spec_stats["drafted"] += int(dlens[r, slot])
                    self.spec_stats["accepted"] += max(e - 1, 0)
                self.spec_stats["emitted"] += e
                for j in range(e):
                    tok = int(toks[r, slot, j])
                    self._outputs[rid].append(tok)
                    self._logprobs[rid].append(float(lps[r, slot, j]))
                    self.lengths[slot] += 1
                    self.cur_tokens[slot] = tok
                    state = self.sched.on_token(slot)
                    if state == 1:
                        self._finish_request(slot, rid)
                        running.discard(slot)
                        break
                    if (tok in self._slot_stop.get(slot, ())
                            or (eos_token_id is not None
                                and tok == eos_token_id)):
                        self.finish_slot(slot)
                        running.discard(slot)
                        break
        if not self.ecfg.fold_flush and self.cache.k_tail is not None:
            # unfolded flush (see EngineConfig.fold_flush): host lengths
            # are exact for continuing slots; EOS'd slots' overhang
            # flushes as stale-masked garbage and the slot is reset on
            # reuse
            self.cache = self._flush(self.cache, jnp.asarray(self.lengths))
        return len(active)

    def _resync_hist(self) -> None:
        """Rebuild the device drafting histories from the host records
        (prompt + all emitted tokens per slot). Plain windows don't
        maintain the on-device history, so a re-probe after a fallback
        stretch must resync first — stale histories only cost draft
        quality (output stays bit-identical), but a resynced drafter is
        the point of the probe."""
        for slot, rid in self._slot_req.items():
            toks = self._slot_prompt.get(slot, []) + self._outputs.get(
                rid, [])
            hl = min(len(toks), self.max_seq)
            self._hist_np[slot, :hl] = toks[-hl:] if hl else 0
            self._hist_np[slot, hl:] = 0
            self._hlen_np[slot] = hl

    def step_serve(self, sampling: SamplingParams = SamplingParams(),
                   eos_token_id: Optional[int] = None) -> int:
        """One adaptive serving step: speculative windows while they pay,
        plain windows when they don't (a T=spec_k verify forward costs
        more than a T=1 decode, so gain < spec_min_gain means speculation
        is a net loss), with periodic spec re-probes. Greedy output is
        bit-identical in every mode."""
        ecfg = self.ecfg
        if not (ecfg.spec_k > 1 and ecfg.device_decode_loop
                and ecfg.spec_adaptive):
            if ecfg.spec_k > 1:
                return (self.step_spec_window(sampling, eos_token_id)
                        if ecfg.device_decode_loop
                        else self.step_spec(sampling,
                                            eos_token_id=eos_token_id))
            return self.step_window(sampling, eos_token_id=eos_token_id)
        if self._spec_mode == "plain":
            self._plain_since_probe += 1
            if self._plain_since_probe >= ecfg.spec_probe_every:
                self._spec_mode = "spec"
                self._plain_since_probe = 0
                self._spec_gains.clear()
                self._resync_hist()
            return self.step_window(sampling, eos_token_id=eos_token_id)
        n = self.step_spec_window(sampling, eos_token_id=eos_token_id)
        if n:
            self._spec_gains.append(self._last_spec_gain)
        if len(self._spec_gains) >= ecfg.spec_probe_len:
            window = self._spec_gains[-ecfg.spec_probe_len:]
            # None: threshold derived from the measured verify-forward
            # cost, ~0.55 * (T+1) plain-steps at T=spec_k (config.py)
            min_gain = (ecfg.spec_min_gain
                        if ecfg.spec_min_gain is not None
                        else 0.55 * (ecfg.spec_k + 1))
            if sum(window) / len(window) < min_gain:
                self._spec_mode = "plain"
            self._spec_gains.clear()
        return n

    # -- device decode window ------------------------------------------------

    def _get_window(self):
        """R decode steps + the tail flush as ONE compiled program
        (lax.scan with on-device sampling): the stepwise path pays a host
        round-trip per token; the window pays one per R tokens and folds
        the window flush into the same dispatch. Per-slot sampling params
        are operands, so one program serves any request mix."""
        fn = self._windows.get("window")
        if fn is not None:
            return fn
        specs_, mc = self.specs, self.cfg
        # R = window length (steps per dispatch). Tail pools size their
        # window depth >= R (spec pools size it spec_window_r * spec_k,
        # larger than the plain R), so a window never overflows the tail.
        R = self._window_r
        S = self.max_seq

        @functools.partial(jax.jit, donate_argnums=(2,))
        def window(params, cur_tokens, cache, lengths, active, key,
                   temp, topk, topp):
            # tail-staged pools: a decode step mutates ONLY the 4 tail
            # arrays (main k/v/scales, length, tail_base are untouched —
            # layers.py _update_tail_slots), so the scan carries just the
            # tails and closes over the rest. Carrying the full cache
            # makes the multi-GB main arrays while-loop carries, and XLA
            # inserts a whole-k-cache relayout copy at the loop boundary
            # (3.0G HLO temp at 96 slots x 256 seq — the r04 capacity
            # OOM, campaign_r04b.log). As invariants they are read in
            # place: no boundary copy, HBM headroom goes to slots.
            staged = cache.k_tail is not None

            def one_step(c, _):
                if staged:
                    tok, tails, lengths, key = c
                    cache_s = cache._replace(
                        k_tail=tails[0], v_tail=tails[1],
                        kt_scale=tails[2], vt_scale=tails[3])
                else:
                    tok, cache_s, lengths, key = c
                key, sub = jax.random.split(key)
                logits, cache_s = self._fwd(params, tok[:, None], cache_s,
                                            specs_, mc,
                                            slot_lengths=lengths,
                                            decode_mesh=self.mesh)
                last = logits[:, -1, :]
                t2 = sample_per_slot(last, sub, temp, topk, topp)
                lp2 = chosen_logprob(last, t2)
                tok = jnp.where(active, t2, tok)
                # clamp: a slot that finishes mid-window keeps computing
                # (static shapes) but must not index past the cache
                lengths = jnp.minimum(lengths + active.astype(jnp.int32),
                                      S - 1)
                carry = (cache_s.k_tail, cache_s.v_tail, cache_s.kt_scale,
                         cache_s.vt_scale) if staged else cache_s
                return (tok, carry, lengths, key), (t2, lp2)

            init = ((cache.k_tail, cache.v_tail, cache.kt_scale,
                     cache.vt_scale) if staged else cache)
            (tok, carry, lengths, key), (toks, lps) = jax.lax.scan(
                one_step, (cur_tokens, init, lengths, key), None, length=R)
            if staged:
                cache = cache._replace(
                    k_tail=carry[0], v_tail=carry[1],
                    kt_scale=carry[2], vt_scale=carry[3])
                if self.ecfg.fold_flush:
                    cache = cache.flush_tail(lengths)
            else:
                cache = carry
            return toks, lps, cache       # toks/lps [R, B]

        self._windows["window"] = (window, R)
        return window, R

    def step_window(self, sampling: SamplingParams = SamplingParams(),
                    eos_token_id: Optional[int] = None) -> int:
        """Admit pending requests, then run a full R-step decode window on
        device (one dispatch: R forward+sample steps + the tail flush).
        Tokens a slot emits after finishing (EOS or token budget) inside
        the window are discarded; admissions happen only at window
        boundaries (a queued request waits up to R-1 extra steps).
        Returns the number of slots that were active in the window."""
        self.drain_async(eos_token_id)
        admits = self.sched.admit()
        if admits:
            self._admit_many(admits)

        active = self.sched.active_slots()
        if not active:
            return 0

        # staged-but-unflushed stepwise tokens would overflow the window
        # buffer mid-scan — flush them first (partial flushes are safe)
        if self.cache.k_tail is not None and self._steps_since_flush:
            self.cache = self._flush(self.cache, jnp.asarray(self.lengths))
            self._steps_since_flush = 0

        active_np = np.zeros((self.n_slots,), bool)
        active_np[active] = True
        self._key, sub = jax.random.split(self._key)
        window, R = self._get_window()
        toks, lps, self.cache = window(
            self.params, jnp.asarray(self.cur_tokens), self.cache,
            jnp.asarray(self.lengths), jnp.asarray(active_np), sub,
            *self._sampling_arrays(sampling))
        self._process_window_rec(
            (toks, lps, list(active),
             {s: self._slot_req.get(s) for s in active}), eos_token_id)
        if not self.ecfg.fold_flush and self.cache.k_tail is not None:
            # unfolded flush (EngineConfig.fold_flush): post-processing
            # host lengths are exact for every continuing slot
            self.cache = self._flush(self.cache, jnp.asarray(self.lengths))
        return len(active)

    def step_window_async(self, sampling: SamplingParams = SamplingParams(),
                          eos_token_id: Optional[int] = None) -> int:
        """Lag-1 pipelined step_window: dispatch window N+1 BEFORE
        fetching window N's outputs, so the fetch round-trip plus the
        host bookkeeping overlap window N+1's device execution (the
        relay pays ~25-100ms per blocking fetch; the sync loop idles the
        chip for exactly that long every window).

        The next window's (cur_tokens, lengths) come from DEVICE carries
        (the in-flight window's outputs) — no host fetch is needed to
        keep decoding. Host values are spliced in per-slot (`use_ov`)
        only where admission rewrote a slot since the last dispatch.
        Costs of the lag: completions are observed one window late, so a
        freed slot re-enters service one window later than the sync loop
        (occupancy loss ~= 1 window per request), and a slot that
        finished in the in-flight window decodes one further window of
        discarded tokens (its stale `active` bit). Tokens are attributed
        at process time via the dispatch-time slot->rid map, so slot
        reuse never leaks another request's tokens."""
        admits = self.sched.admit()
        if admits:
            self._admit_many(admits)
            self._async_overrides.update(slot for _, slot in admits)

        active = self.sched.active_slots()
        if not active:
            self.drain_async(eos_token_id)
            return 0

        if self.cache.k_tail is not None and self._steps_since_flush:
            self.cache = self._flush(self.cache, jnp.asarray(self.lengths))
            self._steps_since_flush = 0

        active_np = np.zeros((self.n_slots,), bool)
        active_np[active] = True
        self._key, sub = jax.random.split(self._key)
        window, R = self._get_window_async()
        if self._async_carry is None:
            # first window of an async run: host state is exact
            carry_tok = jnp.asarray(self.cur_tokens)
            carry_len = jnp.asarray(self.lengths)
            use_ov = np.ones((self.n_slots,), bool)
        else:
            carry_tok, carry_len = self._async_carry
            use_ov = np.zeros((self.n_slots,), bool)
            if self._async_overrides:
                use_ov[list(self._async_overrides)] = True
        toks, lps, ntok, nlen, self.cache = window(
            self.params, carry_tok, carry_len,
            jnp.asarray(self.cur_tokens), jnp.asarray(self.lengths),
            jnp.asarray(use_ov), self.cache, jnp.asarray(active_np), sub,
            *self._sampling_arrays(sampling))
        self._async_carry = (ntok, nlen)
        if not self.ecfg.fold_flush and self.cache.k_tail is not None:
            # unfolded flush with the DEVICE post-window lengths (host
            # lengths are one window stale in async mode); the dispatch
            # carries no fetch, so it pipelines behind the in-flight
            # window
            self.cache = self._flush(self.cache, nlen)
        self._async_overrides.clear()
        prev, self._async_inflight = self._async_inflight, (
            toks, lps, list(active),
            {s: self._slot_req.get(s) for s in active})
        self._async_eos = eos_token_id
        if prev is not None:
            self._process_window_rec(prev, eos_token_id)
        return len(active)

    def drain_async(self, eos_token_id: Optional[int] = None) -> None:
        """Flush lag-1 async state: process the in-flight window (if
        any) and drop the device carries. After processing, the host
        (cur_tokens, lengths) are exact for every running slot (every
        accepted token updated them), so the carries are redundant.
        Called at the top of every non-async step so modes compose.

        When no eos_token_id is given (snapshot(), plain step()), the
        in-flight window is processed under the EOS contract it was
        DISPATCHED with (`self._async_eos`) — draining with None would
        append post-EOS tokens and leave the slot running forever.
        Note the structural lag-1 cost: after the last request finishes,
        the final dispatched window is always fully wasted device time
        (its active mask is stale by one window)."""
        if eos_token_id is None:
            eos_token_id = self._async_eos
        prev, self._async_inflight = self._async_inflight, None
        self._async_carry = None
        self._async_overrides.clear()
        if prev is not None:
            self._process_window_rec(prev, eos_token_id)

    def _process_window_rec(self, rec, eos_token_id) -> None:
        """Fetch + account one decode window's outputs. `rec` carries the
        dispatch-time active list and slot->rid map: a slot whose request
        changed hands (finished + re-admitted before this window was
        processed — async lag) or already finished has its tokens
        DISCARDED, never appended to the new occupant."""
        toks, lps, active_list, rids = rec
        toks = np.asarray(toks)                    # [R, n_slots]
        lps = np.asarray(lps)
        running = {s for s in active_list
                   if rids[s] is not None
                   and self._slot_req.get(s) == rids[s]}
        for r in range(toks.shape[0]):
            if not running:
                break
            for slot in list(running):
                rid = self._slot_req[slot]
                tok = int(toks[r, slot])
                self._outputs[rid].append(tok)
                self._logprobs[rid].append(float(lps[r, slot]))
                self.lengths[slot] += 1
                self.cur_tokens[slot] = tok
                state = self.sched.on_token(slot)
                if state == 1:
                    self._finish_request(slot, rid)
                    running.discard(slot)
                elif (tok in self._slot_stop.get(slot, ())
                      or (eos_token_id is not None
                          and tok == eos_token_id)):
                    self.finish_slot(slot)
                    running.discard(slot)

    def _get_window_async(self):
        """step_window_async's program: the step_window scan, but
        (cur_tokens, lengths) enter as device carries merged with host
        overrides, and the post-scan (tok, lengths) are RETURNED so the
        next dispatch can chain off them without a host fetch."""
        fn = self._windows.get("window_async")
        if fn is not None:
            return fn
        specs_, mc = self.specs, self.cfg
        # R = window length (steps per dispatch). Tail pools size their
        # window depth >= R (spec pools size it spec_window_r * spec_k,
        # larger than the plain R), so a window never overflows the tail.
        R = self._window_r
        S = self.max_seq

        @functools.partial(jax.jit, donate_argnums=(6,))
        def window_async(params, carry_tok, carry_len, ov_tok, ov_len,
                        use_ov, cache, active, key, temp, topk, topp):
            tok = jnp.where(use_ov, ov_tok, carry_tok)
            lengths = jnp.where(use_ov, ov_len, carry_len)
            # tails-only scan carry — see _get_window for why (the full
            # cache as carry costs a whole-k-cache boundary copy)
            staged = cache.k_tail is not None

            def one_step(c, _):
                if staged:
                    tok, tails, lengths, key = c
                    cache_s = cache._replace(
                        k_tail=tails[0], v_tail=tails[1],
                        kt_scale=tails[2], vt_scale=tails[3])
                else:
                    tok, cache_s, lengths, key = c
                key, sub = jax.random.split(key)
                logits, cache_s = self._fwd(params, tok[:, None], cache_s,
                                            specs_, mc,
                                            slot_lengths=lengths,
                                            decode_mesh=self.mesh)
                last = logits[:, -1, :]
                t2 = sample_per_slot(last, sub, temp, topk, topp)
                lp2 = chosen_logprob(last, t2)
                tok = jnp.where(active, t2, tok)
                lengths = jnp.minimum(lengths + active.astype(jnp.int32),
                                      S - 1)
                carry = (cache_s.k_tail, cache_s.v_tail, cache_s.kt_scale,
                         cache_s.vt_scale) if staged else cache_s
                return (tok, carry, lengths, key), (t2, lp2)

            init = ((cache.k_tail, cache.v_tail, cache.kt_scale,
                     cache.vt_scale) if staged else cache)
            (tok, carry, lengths, key), (toks, lps) = jax.lax.scan(
                one_step, (tok, init, lengths, key), None, length=R)
            if staged:
                cache = cache._replace(
                    k_tail=carry[0], v_tail=carry[1],
                    kt_scale=carry[2], vt_scale=carry[3])
                if self.ecfg.fold_flush:
                    cache = cache.flush_tail(lengths)
            else:
                cache = carry
            return toks, lps, tok, lengths, cache

        self._windows["window_async"] = (window_async, R)
        return self._windows["window_async"]

    def _finish_request(self, slot: int, rid: int) -> None:
        """Move a request's buffers to done and clear the slot state
        (single path — budget, EOS, and stop finishes all route here)."""
        self._done[rid] = self._outputs.pop(rid)
        self._done_logprobs[rid] = self._logprobs.pop(rid, [])
        self._slot_req.pop(slot, None)
        self._slot_prompt.pop(slot, None)
        self._slot_sampling.pop(slot, None)
        self._slot_stop.pop(slot, None)
        self._sampling_dev = None

    def finish_slot(self, slot: int) -> None:
        """Early-terminate (EOS) the request in `slot`."""
        rid = self._slot_req.get(slot)
        if rid is None:
            return
        self.sched.finish(slot)
        self._finish_request(slot, rid)

    def run_to_completion(
        self, sampling: SamplingParams = SamplingParams(),
        eos_token_id: Optional[int] = None, max_steps: int = 100000,
    ) -> Dict[int, List[int]]:
        """Drain the queue: step until everything finishes. With
        device_decode_loop (default) each iteration runs a full R-step
        window in one device dispatch (step_window); otherwise one
        stepwise decode per iteration."""
        results: Dict[int, List[int]] = {}
        steps = 0
        use_spec = self.ecfg.spec_k > 1
        use_window = self.ecfg.device_decode_loop and not use_spec
        while self.has_work and steps < max_steps:
            if use_spec:
                # adaptive routing: spec windows while they pay, plain
                # windows with periodic re-probes otherwise (step_serve)
                self.step_serve(sampling, eos_token_id=eos_token_id)
            elif use_window and self.ecfg.async_windows:
                self.step_window_async(sampling, eos_token_id=eos_token_id)
            elif use_window:
                self.step_window(sampling, eos_token_id=eos_token_id)
            else:
                self.step(sampling)
                if eos_token_id is not None:
                    for slot in list(self._slot_req):
                        rid = self._slot_req[slot]
                        if (self._outputs.get(rid)
                                and self._outputs[rid][-1] == eos_token_id):
                            self.finish_slot(slot)
            steps += 1
            results.update(self.finished())
        return results

    # -- internals ---------------------------------------------------------

    def _admit_many(self, admits) -> None:
        """Admit [(rid, slot), ...]: prefill positions 0..n-2 of each
        prompt into its slot (the LAST prompt token is replayed by the
        first decode step, which then emits the first generated token —
        this sidesteps padded-position logits). All multi-token prompts
        admitted in the same step share ONE batched [k, Tp] prefill and
        ONE insert scatter (rows attend only their own prefix, so a
        batched prefill is exact; the insert's whole-cache pass is paid
        once, not k times)."""
        group = []
        for rid, slot in admits:
            prompt = self._prompts.pop(rid)
            self._req_budget.pop(rid, None)   # admitted: scheduler owns it
            n = len(prompt)
            if n > 1:
                group.append((slot, prompt))
            elif self.cache.k_tail is not None:
                # single-token prompt: nothing to insert, but the reused
                # row's tail window must still restart at length 0
                self.cache = self.cache._replace(
                    tail_base=self.cache.tail_base.at[slot].set(0))
            self.lengths[slot] = n - 1
            self.cur_tokens[slot] = prompt[-1]
            self._slot_req[slot] = rid
            if self._drafter is not None:
                self._drafter.reset(slot, prompt)
                hl = min(len(prompt), self.max_seq)
                self._hist_np[slot, :hl] = prompt[-hl:]
                self._hist_np[slot, hl:] = 0
                self._hlen_np[slot] = hl
                self._slot_prompt[slot] = list(prompt)
            self._slot_sampling[slot] = self._req_sampling.pop(rid, None)
            self._slot_stop[slot] = self._req_stop.pop(rid, frozenset())
            self._sampling_dev = None
        if not group:
            return
        # bucket k to a power of two (pad rows duplicate the last request:
        # the insert scatter writes the same values twice — idempotent) so
        # the (k, Tp) program set stays O(log n_slots * Tp buckets); 7B
        # compiles cost minutes over the relay (CLAUDE.md)
        k = len(group)
        k_pad = 1 << (k - 1).bit_length()
        rows = [group[min(i, k - 1)] for i in range(k_pad)]
        n_max = max(len(p) for _, p in group)
        Tp = min(_round_up(max(n_max - 1, 1), self.ecfg.prefill_chunk),
                 self.max_seq)
        Tc, Tp_pad, small_seq = self._prefill_plan(k_pad, Tp)
        toks = np.zeros((k_pad, Tp_pad), np.int32)
        for i, (_, p) in enumerate(rows):
            toks[i, :len(p) - 1] = p[:-1]  # right-pad; positions >= n-1
                                           # are garbage, masked by length
        small = KVCache.create(
            self.cfg.num_hidden_layers, k_pad, small_seq,
            self.cfg.num_key_value_heads, self.cfg.head_dim_,
            jnp.dtype(self.ecfg.kv_dtype),
            head_major=self.cache.head_major)
        toks = jnp.asarray(toks)
        for off in range(0, Tp_pad, Tc):
            # bounded-T continuation chunks into the SAME small cache:
            # cache.length is traced data, so every chunk reuses the one
            # compiled (k_pad, Tc) program. Causality makes the chunked
            # prefill exact per row (each real position only attends its
            # own prefix, written by earlier chunks).
            small = self._prefill(self.params, toks[:, off:off + Tc], small)
        small = self._cut_small(small, Tp)
        self.cache = self._insert(
            self.cache, small,
            jnp.asarray([s for s, _ in rows], jnp.int32),
            jnp.asarray([len(p) - 1 for _, p in rows], jnp.int32))

    def _prefill_plan(self, k_pad: int, Tp: int):
        """Shape plan for a batched admission prefill (shared by
        _admit_many and warmup so the AOT program set matches execution).

        Returns (Tc, Tp_pad, small_seq): chunk width, padded prompt span
        (a Tc multiple), and the small-cache allocation (+ ring slack for
        sliding-window batch-major models, whose static wrap guard needs
        max_seq >= window + chunk)."""
        budget = self.ecfg.prefill_token_budget
        Tc = Tp
        if budget > 0 and k_pad * Tp > budget:
            q = self.ecfg.prefill_chunk
            Tc = max(q, (budget // k_pad) // q * q)
            Tc = min(Tc, Tp)
        n_chunks = -(-Tp // Tc)
        Tp_pad = n_chunks * Tc
        ring = (self.cfg.sliding_window is not None
                and not self.cache.head_major
                and self.cfg.sliding_window_pattern == 1)
        small_seq = Tp_pad + (self.cfg.sliding_window if ring else 0)
        return Tc, Tp_pad, small_seq

    def _cut_small(self, small: KVCache, Tp: int) -> KVCache:
        """Slice a prefilled small cache's slot axis back to the real Tp
        span (drops chunk padding and ring slack) before the insert
        scatter. Head-major scale buffers keep their 128-lane pad —
        _insert slices them to Tp itself."""
        if small.max_seq == Tp:
            return small
        cut = (lambda a: a[:, :, :, :Tp]) if self.cache.head_major \
            else (lambda a: a[:, :, :Tp])
        return small._replace(
            k=cut(small.k), v=cut(small.v),
            k_scale=(cut(small.k_scale) if small.quantized else None),
            v_scale=(cut(small.v_scale) if small.quantized else None))

    def stats(self):
        return self.sched.stats()
