"""Decode-attention microbench: time ONE attention call in isolation.

The full-model bench (bench.py) costs ~5 min per data point through the
relay (init + 1-6 min XLA compile); kernel structure iteration needs a
~1 min loop. This harness chain-times a single decode-attention call at
exact serving shapes and reports ms/call + effective HBM GB/s against the
mandatory-KV-bytes floor.

Timing rule (CLAUDE.md): block_until_ready does not block through the
relay — time chains of dependent calls ended by one device_get, at two
lengths, and difference them.

Impls:
  flash       ops/pallas/flash_decode.py kernel (head-major cache)
  flash_dma   same grid/DMA structure, compute disabled (the kernel's
              bandwidth/overhead floor — mode="dma" diagnostic)
  xla         models/layers.attend on the model's [B,S,n_kv,D] layout
  xla_int8    attend(int8_compute=True) (int8 KV only)

Env knobs: MB_B, MB_S, MB_NKV, MB_NQ, MB_D, MB_KV(int8|bfloat16),
MB_IMPLS(csv), MB_CHAIN (chain length, default 32), MB_HBLK (flash head
block override).

Usage: python examples/attn_microbench.py
Prints one JSON line per impl.
"""
import functools
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixq_tpu.models.layers import attend
from mixq_tpu.ops.pallas.flash_decode import flash_decode_attention


def main():
    B = int(os.environ.get("MB_B", "256"))
    S = int(os.environ.get("MB_S", "128"))
    n_kv = int(os.environ.get("MB_NKV", "32"))
    n_q = int(os.environ.get("MB_NQ", str(n_kv)))
    D = int(os.environ.get("MB_D", "128"))
    kv_dtype = jnp.dtype(os.environ.get("MB_KV", "int8"))
    impls = os.environ.get("MB_IMPLS", "flash,flash_dma,xla").split(",")
    chain = int(os.environ.get("MB_CHAIN", "32"))
    h_blk = os.environ.get("MB_HBLK")
    h_blk = int(h_blk) if h_blk else None

    quantized = kv_dtype == jnp.int8
    key = jax.random.PRNGKey(0)
    kk, kv_, kq = jax.random.split(key, 3)

    # head-major cache (flash layout) + batch-major view (model/XLA layout)
    if quantized:
        k_hm = jax.random.randint(kk, (n_kv, B, S, D), -127, 127, jnp.int8)
        v_hm = jax.random.randint(kv_, (n_kv, B, S, D), -127, 127, jnp.int8)
        ks_hm = jnp.abs(jax.random.normal(kk, (n_kv, B, S), jnp.float32)) * .01
        vs_hm = jnp.abs(jax.random.normal(kv_, (n_kv, B, S), jnp.float32)) * .01
        k_bm = jnp.transpose(k_hm, (1, 2, 0, 3))      # [B, S, n_kv, D]
        v_bm = jnp.transpose(v_hm, (1, 2, 0, 3))
        ks_bm = jnp.transpose(ks_hm, (1, 2, 0))        # [B, S, n_kv]
        vs_bm = jnp.transpose(vs_hm, (1, 2, 0))
    else:
        k_hm = jax.random.normal(kk, (n_kv, B, S, D), jnp.bfloat16)
        v_hm = jax.random.normal(kv_, (n_kv, B, S, D), jnp.bfloat16)
        ks_hm = vs_hm = ks_bm = vs_bm = None
        k_bm = jnp.transpose(k_hm, (1, 2, 0, 3))
        v_bm = jnp.transpose(v_hm, (1, 2, 0, 3))

    q0 = jax.random.normal(kq, (B, n_q, D), jnp.bfloat16)
    lengths = jnp.full((B,), S, jnp.int32)

    kv_bytes = 2 * n_kv * B * S * D * kv_dtype.itemsize
    if quantized:
        kv_bytes += 2 * n_kv * B * S * 4

    W = int(os.environ.get("MB_WIN", str(max(S // 2, 1))))

    def make_fn(impl):
        # caches must be explicit jit args — closed-over arrays are inlined
        # as HLO constants and blow past the relay's request-size limit
        if impl.startswith("flash"):
            # "flash", "flash_dma", "flash_alibi" (in-kernel ALiBi bias),
            # "flash_win" (sliding window via start offset, W=MB_WIN),
            # or "flash:<mode>" passthrough
            mode, al, start = "full", None, None
            cap, sc = 0.0, None
            if impl == "flash_dma":
                mode = "dma"
            elif impl == "flash_alibi":
                from mixq_tpu.models.layers import alibi_slopes

                al = alibi_slopes(n_q)
            elif impl == "flash_win":
                start = jnp.full((B,), S - W, jnp.int32)
            elif impl == "flash_softcap":
                # gemma2 attention variations (r5): logit softcap 50 +
                # query_pre_attn_scalar 256 score scale
                cap, sc = 50.0, 256.0 ** -0.5
            elif ":" in impl:
                mode = impl.split(":", 1)[1]

            b_blk = os.environ.get("MB_BBLK")
            b_blk = int(b_blk) if b_blk else None

            # MB_TAIL=R: attach an R-deep token-major tail (prices the
            # in-kernel tail stages against the tail-free kernel)
            R = int(os.environ.get("MB_TAIL", "0"))
            targs = {}
            if R and impl != "flash_dma":
                kk2 = jax.random.split(kq, 4)
                if quantized:
                    targs = dict(
                        k_tail=jax.random.randint(
                            kk2[0], (R, B, n_kv, D), -127, 127, jnp.int8),
                        v_tail=jax.random.randint(
                            kk2[1], (R, B, n_kv, D), -127, 127, jnp.int8),
                        kt_scale=jnp.abs(jax.random.normal(
                            kk2[2], (B, R, n_kv), jnp.float32)) * .01,
                        vt_scale=jnp.abs(jax.random.normal(
                            kk2[3], (B, R, n_kv), jnp.float32)) * .01,
                    )
                else:
                    targs = dict(
                        k_tail=jax.random.normal(
                            kk2[0], (R, B, n_kv, D), jnp.bfloat16),
                        v_tail=jax.random.normal(
                            kk2[1], (R, B, n_kv, D), jnp.bfloat16))
                targs["tail_lens"] = jnp.full((B,), R - 1, jnp.int32)

            @jax.jit
            def f(q, k, v, ks, vs):
                out = flash_decode_attention(
                    q, k, v, lengths, ks, vs, kv_start=start, mode=mode,
                    h_blk=h_blk, b_blk=b_blk, alibi_slopes=al,
                    softcap=cap, scale=sc, **targs)
                return out.astype(jnp.bfloat16)
            return functools.partial(
                f, k=k_hm, v=v_hm,
                ks=ks_hm if quantized else None,
                vs=vs_hm if quantized else None)
        if impl in ("xla", "xla_int8", "xla_alibi", "xla_win",
                    "xla_softcap"):
            from mixq_tpu.models.layers import alibi_slopes

            al = alibi_slopes(n_q) if impl == "xla_alibi" else None
            win = W if impl == "xla_win" else None
            cap = 50.0 if impl == "xla_softcap" else None
            sc = 256.0 ** -0.5 if impl == "xla_softcap" else None

            @jax.jit
            def f(q, k, v, ks, vs):
                out = attend(q[:, None], k, v,
                             jnp.full((1,), S - 1, jnp.int32), lengths,
                             k_scale=ks, v_scale=vs,
                             int8_compute=(impl == "xla_int8"),
                             alibi=al, sliding_window=win,
                             scale=sc, softcap=cap)
                return out[:, 0].astype(jnp.bfloat16)
            return functools.partial(
                f, k=k_bm, v=v_bm,
                ks=ks_bm if quantized else None,
                vs=vs_bm if quantized else None)
        if impl == "memcpy":
            # calibration: known-cost op (read+write kv_bytes of f32) to
            # validate the chain-timing methodology at this shape
            @jax.jit
            def f(q, k, v):
                # non-zero scale: mul-by-0 would let XLA DCE the reads
                s = (k.sum() + v.sum()) * jnp.float32(1e-30)
                return q + s.astype(q.dtype)
            # read K+V once per call; output depends on them so no DCE
            kf = k_hm.astype(jnp.float32) if quantized else k_hm
            vf = v_hm.astype(jnp.float32) if quantized else v_hm
            return functools.partial(f, k=kf, v=vf)
        raise ValueError(impl)

    dev = jax.devices()[0]
    print(f"# {dev} B={B} S={S} n_kv={n_kv} n_q={n_q} D={D} kv={kv_dtype} "
          f"kv_bytes={kv_bytes/1e6:.0f}MB chain={chain}", file=sys.stderr)

    for impl in impls:
        impl = impl.strip()
        if not impl:
            continue
        if impl == "xla_int8" and not quantized:
            continue
        fn = make_fn(impl)
        # compile (retry: relay remote_compile intermittently 500s)
        q = q0
        err = None
        for attempt in range(4):
            try:
                t0 = time.time()
                q = fn(q0)
                _ = jax.device_get(q[0, 0, 0])
                print(f"# {impl}: compile+first {time.time()-t0:.1f}s",
                      file=sys.stderr)
                err = None
                break
            except Exception as e:   # noqa: BLE001
                err = e
                print(f"# {impl}: attempt {attempt} failed "
                      f"({type(e).__name__}: {str(e)[:200]})", file=sys.stderr)
                time.sleep(15)
        if err is not None:
            print(json.dumps({"impl": impl, "error": str(err)[:300]}))
            continue

        def run(n, q):
            t0 = time.time()
            for _ in range(n):
                q = fn(q)
            _ = jax.device_get(q[0, 0, 0])
            return time.time() - t0, q

        _, q = run(4, q)                      # warmup
        t1, q = run(chain, q)
        t2, q = run(2 * chain, q)
        per_call = max((t2 - t1) / chain, 1e-9)
        gbps = kv_bytes / per_call / 1e9
        print(json.dumps({
            "impl": impl, "B": B, "S": S, "n_kv": n_kv, "n_q": n_q, "D": D,
            "kv": str(kv_dtype), "ms_per_call": round(per_call * 1e3, 3),
            "eff_GBps": round(gbps, 1),
            "kv_MB": round(kv_bytes / 1e6, 1),
        }))


if __name__ == "__main__":
    main()
