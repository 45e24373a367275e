"""North-star benchmark: fused SDF query+backward throughput per chip.

Workload mirrors the reference's ScanNet mapping configuration
(configs/rgbd/scannet.yaml: 1e6 points/step, 2-level grid fdim=4,
cells 0.5 m / 0.1 m over a ~10x9x3 m bound, 64x1 MLP decoder) running
the FULL mapping optimization step: multi-level trilinear interpolation
+ decode, L1 SDF + free-space losses, gradients wrt grids+decoder, and
the masked-Adam update -- i.e. what the reference spends its time on in
`grid_opt/trainer.py:196-219`.  float32 feature storage (the default);
grid.feature_dtype=bfloat16 trains to the same SDF MAE and gives ~2.5x
on query-only paths (meshing/eval/tracking forward), but the full train
step is dominated by the scatter-add backward + Adam update, where bf16
measured neutral on-chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}) and no CUDA GPU exists in this environment, so the
denominator is an ESTIMATE of the torch/CUDA reference's step
throughput on its target GPU: ~25 ms / 1e6-point mapping step
(grid_sample fwd+bwd x2 levels + MLP + Adam on an RTX-class card)
= 4e7 points/s.
"""
import sys, os, json, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_ESTIMATE_PTS_PER_SEC = 4.0e7


def main():
    import jax
    import jax.numpy as jnp

    from miso_tpu.losses.miso import make_loss, mapping_loss
    from miso_tpu.models.grid_net import create_grid_net, grid_net_mask
    from miso_tpu.train.optim import masked_adam_init
    from miso_tpu.train.trainer import make_train_step

    N = 1_000_000
    cfg = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "bound": [[-0.02, 10.38], [-0.01, 8.74], [-0.01, 3.03]],
                 "base_cell_size": 0.5, "per_level_scale": 5.0, "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 64, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": 372},
    }
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def sample_batch():
        return {k: jnp.asarray(v) for k, v in {
            "coords_frame": rng.uniform([0, 0, 0], [10.3, 8.7, 3.0],
                                        (N, 3)).astype(np.float32),
            "sample_frame_ids": rng.integers(0, 372, (N,)).astype(np.int32),
            "weights": np.ones((N, 1), np.float32),
            "sdf": rng.uniform(-0.15, 0.15, (N, 1)).astype(np.float32),
            "sdf_valid": (rng.uniform(size=(N, 1)) < 0.7).astype(np.float32),
            "sdf_signs": (rng.uniform(size=(N, 1)) < 0.2).astype(np.float32),
        }.items()}

    # A few pre-sampled device-resident batches rotated through the timed
    # loop (H2D excluded by design; rotation rules out identical-arg
    # dispatch artifacts, CLAUDE.md rule 2).
    batches = [sample_batch() for _ in range(4)]
    batch = batches[0]
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.1, trunc_dist=0.15)
    step = make_train_step(loss_fn, "adam")
    mask = grid_net_mask(model, level=model.num_levels, pose=False)
    opt_state = masked_adam_init(model)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)

    # Warmup/compile.  The warmup result is MATERIALIZED (D2H value
    # read): on the axon backend ``block_until_ready`` is NOT an
    # execution barrier -- a chain of dispatches that nothing ever
    # materializes is never executed, and "blocking" on it returns in
    # ~0 ms.  Measured 2026-08-21: this exact loop reports
    # 0.45 ms/step with block_until_ready-only sync and 1162 ms/step
    # once a value read forces real execution.  Rounds 1-4 of this
    # repo published the artifact (2.7-3.8e9 pts/s); the honest
    # number is ~0.9e6 pts/s (and the artifact was physically
    # impossible: 0.27 ms/step implies ~3.8 TB/s of gather traffic on
    # an ~0.8 TB/s HBM part).
    model_, opt_, tl, _ = step(model, opt_state, batch, key, mask, lr)
    float(tl)
    model, opt_state = model_, opt_

    # Chained steps (model/opt flow through), synced per chunk of 10 by
    # a VALUE READ of the final loss (the only real barrier, see above)
    # to collect a per-step time distribution while amortizing host
    # RTT (~25 ms/read).  Batches and RNG keys rotate across steps.
    keys = list(jax.random.split(key, 8))
    chunks = 10
    per_chunk = 10
    chunk_times = []
    i = 0
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(per_chunk):
            model, opt_state, tl, _ = step(
                model, opt_state, batches[i % len(batches)],
                keys[i % len(keys)], mask, lr)
            i += 1
        float(tl)
        chunk_times.append((time.perf_counter() - t0) / per_chunk)
    med = float(np.median(chunk_times))
    p10 = float(np.percentile(chunk_times, 10))
    pts_per_sec = N / med

    print(json.dumps({
        "metric": "sdf_query_backward_train_step_points_per_sec_per_chip",
        "value": pts_per_sec,
        "unit": "points/s",
        "vs_baseline": pts_per_sec / REFERENCE_ESTIMATE_PTS_PER_SEC,
        "step_ms_median": med * 1e3,
        "step_ms_p10": p10 * 1e3,
        "scope": ("full mapping train step (interp+decode fwd, L1+FS "
                  "loss, grads, masked Adam) on device-resident "
                  "1e6-point batches (4 rotating) with rotating RNG "
                  "keys; EXCLUDES host sampling + H2D; synced by "
                  "per-chunk VALUE READS (block_until_ready is not an "
                  "execution barrier on this backend -- earlier rounds' "
                  "2.7-3.8e9 pts/s were that artifact). "
                  "vs_baseline divides by an ESTIMATE (4e7 pts/s) of "
                  "the torch/CUDA reference's step throughput on an "
                  "RTX-class GPU - the reference publishes no numbers "
                  "and no GPU exists here."),
    }))


if __name__ == "__main__":
    main()
