"""Worker for the 2-process distributed test (run via subprocess, one per
fake "host"). Exercises the real multi-host bring-up path the reference
lacks entirely (SURVEY.md §2.9): `initialize_distributed` +
`multihost_mesh` forming a (data=2 hosts, model=4 devices) hybrid mesh,
TP-sharded quantized params, DP-sharded batch, one jitted forward, and a
cross-process allgather of the logits.

Usage: python _multiprocess_worker.py <process_id> <num_processes> <port> <outdir>
The parent sets JAX_PLATFORMS=cpu and XLA_FLAGS for 4 local virtual devices.
"""
import os
import sys

# Hermetic CPU backend (the environment's sitecustomize registers a TPU
# backend in every process — force CPU before AND after importing jax).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]

    from mixq_tpu.parallel.mesh import initialize_distributed, multihost_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    local = jax.local_device_count()

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mixq_tpu.config import ModelConfig
    from mixq_tpu.models import DecoderSpecs, KVCache
    from mixq_tpu.models.decoder import forward, init_decoder_params
    from mixq_tpu.ops.mixed_linear import LinearSpec
    from mixq_tpu.parallel import shard_decoder_params, shard_kv_cache

    # TP inside each "host" (the ICI analogue), DP across processes (DCN).
    mesh = multihost_mesh(tp_size=local)
    assert dict(mesh.shape) == {"data": nproc, "model": local}

    cfg = ModelConfig.tiny(num_key_value_heads=4, intermediate_size=128)
    specs = DecoderSpecs.uniform(LinearSpec(w_bit=8, a_bit=8))
    # Same seed on every process -> identical host param values; device_put
    # onto the global mesh turns them into one sharded global pytree.
    params = init_decoder_params(jax.random.PRNGKey(0), cfg, specs)
    sparams = shard_decoder_params(params, mesh)

    batch_global, seq = 4, 8
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (batch_global, seq), 0,
                           cfg.vocab_size), np.int32)
    rows = batch_global // nproc
    local_tokens = tokens[pid * rows:(pid + 1) * rows]
    gtokens = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local_tokens)

    cache = shard_kv_cache(
        KVCache.create(cfg.num_hidden_layers, batch_global, 16,
                       cfg.num_key_value_heads, cfg.head_dim_, jax.numpy.bfloat16),
        mesh)

    jfwd = jax.jit(forward, static_argnames=("specs", "cfg"))
    logits, _ = jfwd(sparams, gtokens, cache, specs=specs, cfg=cfg)
    full = multihost_utils.process_allgather(logits, tiled=True)
    if pid == 0:
        np.save(os.path.join(outdir, "logits.npy"),
                np.asarray(full, np.float32))
        np.save(os.path.join(outdir, "tokens.npy"), tokens)
    multihost_utils.sync_global_devices("done")
    print(f"[worker {pid}] ok", flush=True)


if __name__ == "__main__":
    main()
