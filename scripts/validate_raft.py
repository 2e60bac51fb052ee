"""Validate the RAFT teacher against real torchvision weights.

Usage (on a machine with torchvision + network or downloaded weights):

    python scripts/validate_raft.py raft_large [image1.png image2.png]

Loads torchvision's pretrained RAFT, saves its state_dict to
$V2V_WEIGHTS_DIR/raft_{small,large}.pth (the file the training teacher
loads, training/raft.py:_load_params), converts it, and compares the
flax flow field against torchvision's on a real or synthetic pair.

The offline schema/parity proof (converter key/shape match + numeric
agreement with a structurally exact torch twin) already runs in
tests/test_teacher_converters.py; this script is the final end-to-end
check with genuine pretrained weights.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "raft_large"
    assert name in ("raft_small", "raft_large"), name
    try:
        import torch
        import torchvision
        from torchvision.models import optical_flow as of
    except ImportError as e:
        raise SystemExit(
            f"torchvision required for live validation ({e}); the offline "
            f"structural proof is tests/test_teacher_converters.py")

    import numpy as np

    wdir = os.environ.get("V2V_WEIGHTS_DIR", "pretrained")
    os.makedirs(wdir, exist_ok=True)
    builder = of.raft_small if name == "raft_small" else of.raft_large
    tmodel = builder(weights="DEFAULT")
    tmodel.eval()
    path = os.path.join(wdir, f"{name}.pth")
    torch.save(tmodel.state_dict(), path)
    print(f"saved torchvision {name} weights -> {path}")

    if len(sys.argv) >= 4:
        import cv2
        i1 = cv2.imread(sys.argv[2])[..., ::-1].astype(np.float32)
        i2 = cv2.imread(sys.argv[3])[..., ::-1].astype(np.float32)
        i1 = i1 / 127.5 - 1.0
        i2 = i2 / 127.5 - 1.0
        h8, w8 = i1.shape[0] // 8 * 8, i1.shape[1] // 8 * 8
        i1, i2 = i1[:h8, :w8], i2[:h8, :w8]
    else:
        rng = np.random.RandomState(0)
        base = rng.rand(128, 136, 3).astype(np.float32) * 2 - 1
        i1 = base
        i2 = np.roll(base, shift=(2, 3), axis=(0, 1))
    t1 = torch.tensor(i1.transpose(2, 0, 1))[None]
    t2 = torch.tensor(i2.transpose(2, 0, 1))[None]

    iters = 12
    with torch.no_grad():
        t_flow = tmodel(t1, t2, num_flow_updates=iters)[-1].numpy()

    import jax
    import jax.numpy as jnp
    from v2v_tpu.training.raft import RAFT, _load_params
    model = RAFT(small=name == "raft_small", iters=iters)
    params = _load_params(name, model)
    f_flow = np.transpose(np.asarray(
        model.apply(params, jnp.asarray(i1)[None], jnp.asarray(i2)[None])),
        (0, 3, 1, 2))
    err = np.abs(t_flow - f_flow)
    print(f"{name}: max |dflow| = {err.max():.5f}, "
          f"mean = {err.mean():.6f}, torch EPE mag mean = "
          f"{np.hypot(t_flow[:, 0], t_flow[:, 1]).mean():.3f}")
    assert err.max() < 5e-2, "conversion mismatch"
    print("OK: flax RAFT teacher matches torchvision")


if __name__ == "__main__":
    main()
