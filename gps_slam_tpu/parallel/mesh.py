"""Multi-chip scaling via jax.sharding — the TPU-native answer to the
reference's (absent) distributed layer.

The reference is strictly single-GPU (SURVEY §2.4: no NCCL/MPI anywhere;
`dev_id` selects one device, slam_trainer.cpp:17-18).  The natural
multi-chip axes for this workload, expressed purely with a Mesh +
shard_map + collectives over ICI:

  * **Camera data-parallel training** (`dp_train_step`): the per-window
    optimization batch is sharded over the "data" axis; every device
    renders + differentiates its local cameras, gradients are `pmean`ed,
    the (replicated) Adam update is applied identically everywhere.  This
    generalizes the reference's one-random-camera-per-iteration loop
    (slam_pipeline.cpp:231-239) to num_devices cameras per iteration.
  * **Camera data-parallel evaluation** (`dp_render`): eval rendering over
    ~2000 frames is embarrassingly parallel (slam_pipeline.cpp:588-695);
    cameras are sharded, renders gathered.

No DCN, no hand-rolled backend: everything rides XLA collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gs import losses, optim
from ..gs.model import RenderStatics, ges_forward


def make_mesh(n_devices: int | None = None, axis: str = "data",
              platform: str | None = None) -> Mesh:
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n and platform is None:
        # the default backend is smaller than requested (e.g. one real TPU
        # while dry-running an 8-way mesh): fall back to the virtual CPU
        # devices (xla_force_host_platform_device_count)
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def dp_train_step_fn(mesh: Mesh, st: RenderStatics, tx_cfg, max_iterations: int,
                     ssim_weight: float):
    """Build the jitted data-parallel training step.

    cam_batch arrays are sharded over axis 0 ("data"); params/opt_state are
    replicated.  Returns step(params, alive, opt_state, cam_batch) ->
    (params, opt_state, loss)."""
    from jax import shard_map

    tx = optim.make_optimizer(optim_cfg(tx_cfg), max_iterations)

    def local_loss(params, alive, batch):
        def one(c2w, K, gt, ref, base, cid):
            res = ges_forward(params, alive, c2w, K, ref, base, cid, st)
            return losses.compute_loss(
                res["rgb"], res["depth"], gt, None, ssim_weight, 0.0
            )["total"]

        vals = [
            one(batch["c2w"][i], batch["K"][i], batch["gt_rgb"][i],
                batch["ref_depth"][i], batch["base_color"][i], batch["cam_id"][i])
            for i in range(batch["c2w"].shape[0])
        ]
        return jnp.mean(jnp.stack(vals))

    def step_shard(params, alive, opt_state, batch):
        loss, grads = jax.value_and_grad(local_loss)(params, alive, batch)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rep = P()
    shd = P("data")
    step = shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(rep, rep, rep, shd),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(step)


class optim_cfg:
    """Adapter giving attribute access over the tx_cfg tuple
    (gs.model._TxCfg layout)."""

    def __init__(self, t):
        (self.means_lr, self.means_lr_final, self.scales_lr, self.quats_lr,
         self.featuresDc_lr, self.featuresRest_lr, self.opacities_lr,
         self.exposure_lr, self.use_exposure) = t


def dp_render_fn(mesh: Mesh, st: RenderStatics):
    """Data-parallel eval render: cameras sharded over "data", image dict
    (rgb/alpha/depth) returned sharded (callers gather lazily via
    addressable shards).  This is the >1-device path of
    SLAMPipeline.render_eval_imgs (renderEvalImgs, slam_pipeline.cpp:
    588-695)."""
    from jax import shard_map

    def render_shard(params, alive, batch):
        outs = []
        for i in range(batch["c2w"].shape[0]):
            res = ges_forward(
                params, alive, batch["c2w"][i], batch["K"][i],
                batch["ref_depth"][i], batch["base_color"][i],
                batch["cam_id"][i], st,
            )
            outs.append({
                "rgb": jnp.clip(res["rgb"], 0.0, 1.0),
                "alpha": res["alpha"],
                "depth": res["depth"],
            })
        return jax.tree.map(lambda *x: jnp.stack(x), *outs)

    rep = P()
    shd = P("data")
    f = shard_map(
        render_shard, mesh=mesh, in_specs=(rep, rep, shd), out_specs=shd,
        check_vma=False,
    )
    return jax.jit(f)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    shd = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, shd) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
