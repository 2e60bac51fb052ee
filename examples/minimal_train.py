"""Minimal library-level usage: the fused V2V train step without the
config system — synthesize voxels from video ON DEVICE, scan E2VID over
T, take an Adam step; then run streaming inference with explicit state.

Runs anywhere (CPU included); on TPU the simulator uses the fused
Pallas kernel automatically. See docs/API.md for the full surface.

    python examples/minimal_train.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))  # repo checkout; unnecessary once pip-installed

import numpy as np
import jax
import jax.numpy as jnp

from v2v_tpu.ops.voxel import SimConfig
from v2v_tpu.training.interface import ModelInterface
from v2v_tpu.training.optim import Adam
from v2v_tpu.training.steps import make_train_step

B, T, BINS, H, W = 2, 3, 5, 32, 32

module_cfg = {
    "loss": {"l1_weight": 1.0},
    "model": {
        "target": "model.model.E2VIDRecurrent",   # reference target string
        "params": {"unet_kwargs": {
            "num_bins": BINS, "skip_type": "sum",
            "recurrent_block_type": "convlstm", "num_encoders": 3,
            "base_num_channels": 8, "num_residual_blocks": 1,
            "use_upsample_conv": True, "final_activation": "",
            "norm": "none"}},
    },
}

iface = ModelInterface(module_cfg)
params, _ = iface.init(jax.random.PRNGKey(0), B, H, W, BINS)
opt = Adam(lr=1e-4).make()
opt_state = opt.init(params)

# one fused jitted step: uint8 video in -> ESIM synthesis -> scan ->
# loss -> update (this is what train.py runs per batch)
step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)

# a synthetic "video": a drifting gradient, (B, T*BINS+1, H, W) uint8
n_frames = T * BINS + 1
xx = np.mgrid[0:H, 0:W][1]
video = np.stack([((xx + 3 * t) % W) / W * 255 for t in range(n_frames)])
video = np.broadcast_to(video, (B,) + video.shape).astype(np.uint8)
batch = {"video": jnp.asarray(video),
         "data_source_idx": jnp.full((B,), 11, jnp.int32)}

for i in range(5):
    # production varies the key per step (fresh thresholds/noise per
    # synthesis); pinned here so the loss visibly decreases
    params, opt_state, loss, aux = step(params, opt_state, batch,
                                        jax.random.PRNGKey(1))
    print(f"step {i}: loss {float(loss):.4f}")

# streaming inference: recurrent state is an explicit pytree
state = iface.init_state(1, H, W)
events = jnp.asarray(np.random.RandomState(0).randint(
    -2, 3, (1, T, H, W, BINS)).astype(np.float32))
pred, state = jax.jit(lambda p, e, s: iface.forward_sequence(
    p, e, s, train=False))(params, events, state)
print("pred", pred.shape, "range",
      float(pred.min()), float(pred.max()))
