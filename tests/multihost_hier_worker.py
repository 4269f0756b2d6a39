"""Worker for the HIERARCHICAL multi-host test (run by test_multihost.py).

Each of the 2 processes owns FOUR virtual CPU devices, so the global
(data=4, model=2) mesh spans BOTH the intra-process boundary (the ICI
analog: the 'model' axis lives inside one process) and the inter-process
boundary (the DCN analog: 'data' rows 0-1 live in process 0, rows 2-3 in
process 1) — the layout a real multi-chip pod uses for tensor-parallel
training with data parallelism across hosts.

The fused Pallas train decoder (interpret mode) runs through shard_map on
that global mesh, and the resulting parameter gradients are compared IN
EACH WORKER against single-local-device autodiff of the same loss — a
missing/wrong psum across either boundary would scale decoder grads by a
shard-count factor.

Usage: python multihost_hier_worker.py <pid> <nproc> <coordinator>
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator = sys.argv[3]

    os.environ["MTTS_PALLAS_TRAIN_DECODER"] = "interpret"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nproc, pid)
    assert jax.local_device_count() == 4, jax.local_devices()
    assert jax.device_count() == 4 * nproc, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(__file__))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from corpus_utils import tiny_model_hp

    from multilingual_text_to_speech_tpu.models.decoder import Decoder
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder as ptd

    hp = tiny_model_hp(
        multi_speaker=True, multi_language=True, speaker_number=4,
        language_number=2, languages=["de", "fr"],
        decoder_regularization="zoneout")
    hp.dropout = 0.0
    hp.zoneout_hidden = 0.0
    hp.zoneout_cell = 0.0
    hp.dropout_hidden = 0.0
    assert ptd.supports(hp)

    # deterministic batch, identical in both processes
    batch, text_len, frames = 8, 24, 12
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (batch, text_len)),
                       jnp.int32)
    lengths = jnp.asarray(
        np.clip(rng.randint(text_len // 2, text_len + 1, batch), 2, text_len),
        jnp.int32)
    speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch),
                           jnp.int32)
    languages = jnp.asarray(np.arange(batch) % hp.language_number, jnp.int32)
    target = jnp.asarray(rng.randn(batch, frames, hp.num_mels), jnp.float32)
    tlen = jnp.full((batch,), frames, jnp.int32)
    args = (text, lengths, target, tlen, speakers, languages)

    # single-LOCAL-device reference: plain autodiff on this process's first
    # device, no mesh — multiprocess-safe because it touches no remote data
    local = jax.local_devices()[0]
    model_single = Tacotron(hp, train=True)
    key = jax.random.PRNGKey(0)
    with jax.default_device(local):
        variables = model_single.init(key, *args, 1.0, key)

    def loss_fn(model):
        def f(params):
            k = jax.random.PRNGKey(3)
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                *args, 1.0, k, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(k, 1)})
            return (jnp.mean((out["pre_prediction"] - target) ** 2)
                    + 0.1 * jnp.mean(out["stop_token"] ** 2)
                    + 0.05 * jnp.mean(out["alignment"] ** 2))
        return f

    calls = {"n": 0}
    orig = ptd.make_train_decode_fn

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    ptd.make_train_decode_fn = counted
    try:
        with jax.default_device(local):
            g_single = jax.jit(jax.grad(loss_fn(model_single)),
                               device=local)(variables["params"])
            jax.block_until_ready(g_single)
        assert calls["n"] >= 1, "fused train decoder did not engage (local)"

        # global hierarchical mesh: 'model' inside a process, 'data' rows
        # split 2+2 across the two processes
        mesh = Mesh(np.asarray(jax.devices()).reshape(4 * nproc // 2, 2),
                    axis_names=("data", "model"))
        assert Decoder._mesh_shard_batch(mesh, batch) in (
            batch // mesh.size, batch // mesh.shape["data"])
        row_owners = {d.process_index for d in mesh.devices[:, 0]}
        assert len(row_owners) == nproc, "data axis must span processes"

        replicated = NamedSharding(mesh, P())
        params_g = jax.device_put(variables["params"], replicated)
        model_dp = Tacotron(hp, train=True, mesh=mesh)
        calls["n"] = 0
        g_dp = jax.jit(jax.grad(loss_fn(model_dp)),
                       out_shardings=replicated)(params_g)
        jax.block_until_ready(g_dp)
        assert calls["n"] >= 1, "fused train decoder did not engage (mesh)"
    finally:
        ptd.make_train_decode_fn = orig

    worst, worst_k = 0.0, None
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(g_single),
            jax.tree_util.tree_leaves_with_path(g_dp)):
        a, b = np.asarray(va), np.asarray(jax.device_get(vb))
        rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-6))
        if rel > worst:
            worst, worst_k = rel, jax.tree_util.keystr(pa)
    assert worst < 1e-4, (worst, worst_k)

    print(json.dumps({
        "pid": pid,
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh": {"data": 4 * nproc // 2, "model": 2},
        "grad_worst_rel": worst,
        "grad_worst_key": worst_k,
    }), flush=True)


if __name__ == "__main__":
    main()
