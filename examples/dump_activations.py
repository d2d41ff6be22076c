"""Dump per-linear input activations to .npz for real-activation kernel
benchmarking (the reference benches kernels on saved activation dumps,
examples/benchbitsand.py:33-39, because outlier behavior only appears on
real activations — SURVEY.md §4.3).

  python examples/dump_activations.py --output acts.npz
      [--model_path <quantized_or_hf_dir> | --engineered]
      [--tokens 512] [--batch 8] [--layers 2] [--platform cpu]

Default --engineered builds a 7B-shaped (hidden 4096 / intermediate 11008)
random model with engineered outlier channels (large-scale embedding
columns — the structural analogue of Llama's systematic outlier channels,
same device as tests/test_ppl_gate.py) so the dump carries realistic
outlier sparsity at the real kernel shapes without needing a checkpoint.

Keys: "<layer>.<slot>" for slot in (wqkv, wo, up, down), arrays [M, K] f32.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--engineered", action="store_true",
                    help="7B-shaped random model with engineered outlier "
                         "channels (default when no --model_path)")
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--intermediate", type=int, default=11008)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=64, help="tokens per row")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--outlier_channels", default="5,170,1033,2071,3555",
                    help="embedding channels boosted to create outliers")
    ap.add_argument("--boost", type=float, default=60.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import functools

    import jax.numpy as jnp
    import numpy as np

    from mixq_tpu.config import ModelConfig
    from mixq_tpu.models import DecoderSpecs, KVCache
    from mixq_tpu.models.decoder import forward, init_decoder_params

    if args.model_path:
        from mixq_tpu.models.auto import AutoModel

        params, cfg, specs = AutoModel.from_quantized(args.model_path)
    else:
        cfg = ModelConfig(
            model_type="llama", vocab_size=2048, hidden_size=args.hidden,
            intermediate_size=args.intermediate,
            num_hidden_layers=args.layers, num_attention_heads=args.heads,
            num_key_value_heads=args.heads)
        specs = DecoderSpecs.fp16()
        params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs,
                                     dtype=jnp.bfloat16)
        # engineered outliers: boosted embedding channels propagate through
        # the residual stream into every linear's input
        chans = np.asarray([int(c) for c in args.outlier_channels.split(",")])
        chans = chans[chans < args.hidden]
        embed = np.asarray(params.embed, np.float32)
        embed[:, chans] *= args.boost
        params = params._replace(embed=jnp.asarray(embed, params.embed.dtype))

    B, T = args.batch, args.tokens
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0,
                                cfg.vocab_size).astype(jnp.int32)
    cache = KVCache.create(cfg.num_hidden_layers, B, T,
                           cfg.num_key_value_heads, cfg.head_dim_,
                           jnp.bfloat16)

    fwd = functools.partial(forward, collect_stats="full")
    _, _, stats = jax.jit(
        fwd, static_argnames=("specs", "cfg"))(
        params, tokens, cache, specs=specs, cfg=cfg)

    out = {}
    for key, act in stats.items():
        a = np.asarray(act, np.float32)
        out[key] = a.reshape(-1, a.shape[-1])    # [B*T, K]
    np.savez_compressed(args.output, **out)
    sizes = {k: v.shape for k, v in out.items()}
    print(f"wrote {args.output}: {len(out)} tensors {sizes}")


if __name__ == "__main__":
    main()
