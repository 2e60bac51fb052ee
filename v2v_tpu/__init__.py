"""v2v_tpu — a TPU-native JAX/Flax/Pallas framework for event-camera model
training and benchmarking without stored event datasets.

Re-designed from scratch against the capabilities of the reference V2V
framework (PyTorch, see /root/reference): on-the-fly video->voxel event
simulation, recurrent reconstruction / optical-flow model zoo, unified h5
test harness, and config-YAML driven train/test entry points.

Design stance (TPU-first, not a port):
  * The ESIM event simulator runs ON DEVICE as a fused jnp/Pallas kernel
    (reference runs it in numpy inside CPU dataloader workers,
    data/v2v_core_esim.py:26-69).
  * The per-timestep recurrence is `jax.lax.scan` with explicit state
    pytrees (reference: python loop mutating `self.states`,
    model/train_utils.py:339-345).
  * Data parallelism is a `jax.sharding.Mesh` + NamedSharding over a
    'data' axis (reference: NCCL DDP, train.py:41-58).
  * All tensors are channels-last (NHWC) — the TPU-native conv layout.
"""

__version__ = "0.1.0"
