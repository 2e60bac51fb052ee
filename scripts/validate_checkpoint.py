"""Validate a real released checkpoint end-to-end against the reference.

One command per released model family (BASELINE.md acceptance): build
the REFERENCE torch model (from the repo mounted at /root/reference or
$V2V_REFERENCE), load the genuine .pth, convert it with this
framework's converter, run both models on identical inputs, and report
the max deviation per step.

    python scripts/validate_checkpoint.py configs/test_e2vid++_original.yaml \
        checkpoints/e2vid++.pth [--steps 3] [--height 64 --width 80] [--tol 1e-3]

Covers every family the reference ships checkpoints for: E2VID/E2VID++
/ EVFlowNet / ETNet / HyperE2VID (voxel-in, dict-out), ERAFT (voxel
pairs + warm start), NerNet (raw event streams). The offline
random-weight twins of this check run in tests/test_convert*.py; this
script is the final turnaround step on a machine that has the real
checkpoint files.
"""
import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

REFERENCE = os.environ.get("V2V_REFERENCE", "/root/reference")

# reference target suffix -> (kind, default tolerance). 12 recurrent
# iterations (eraft) / learned voxelization scatter (nernet) amplify fp
# noise; the voxel models agree to ~1e-3 with real-magnitude weights.
_FAMILIES = {
    "ERAFT": ("eraft", 2e-2),
    "RepresentationRecurrent": ("nernet", 2e-2),
}


def _ref_class(target):
    module, cls = target.rsplit(".", 1)
    sys.path.insert(0, REFERENCE)
    try:
        return getattr(importlib.import_module(module), cls)
    finally:
        sys.path.remove(REFERENCE)


def _load_state_dict(path):
    import torch
    saved = torch.load(path, map_location="cpu", weights_only=False)
    sd = saved.get("state_dict", saved)
    # reference train.py:18-39 (convert_to_compiled): DDP / torch.compile
    # wrap keys with module. / _orig_mod. prefixes
    def strip(k):
        for p in ("module.", "_orig_mod."):
            while k.startswith(p):
                k = k[len(p):]
        return k
    return {strip(k): v for k, v in sd.items()}


def _nhwc(x):
    import numpy as np
    return np.transpose(x, (0, 2, 3, 1))


def _to_torch_sd(tmodel, sd, non_strict=False):
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    if missing or unexpected:
        # a key mismatch means the released weights were never actually
        # installed — both sides would then compare the SAME random init
        # and report a meaningless PASS. Fatal unless explicitly waived.
        msg = (f"checkpoint/model key mismatch: "
               f"missing={list(missing)[:5]} "
               f"unexpected={list(unexpected)[:5]} "
               f"({len(missing)} missing / {len(unexpected)} unexpected)")
        if not non_strict:
            raise SystemExit(f"FAIL: {msg} — wrong config/checkpoint pair? "
                             f"(--non-strict to override)")
        print(f"  [warn] {msg}")
    tmodel.eval()


def _compare(name, t_out, f_out, tol):
    import numpy as np
    err = float(np.abs(np.asarray(t_out) - np.asarray(f_out)).max())
    status = "ok" if err <= tol else "FAIL"
    print(f"  {name}: max abs err {err:.3e}  [{status}] (tol {tol:g})")
    return err <= tol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--non-strict", action="store_true",
                    help="tolerate checkpoint/model key mismatches "
                         "(default: fatal — they mean the weights were "
                         "never loaded)")
    args = ap.parse_args()

    import numpy as np
    import torch
    import jax
    # parity vs fp32 torch: never let TPU default to bf16 matmul passes
    jax.config.update("jax_default_matmul_precision", "highest")
    # the container's sitecustomize registers the TPU plugin before env
    # vars are read, so honor JAX_PLATFORMS via the config API too
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from v2v_tpu.config import load_yaml, instantiate_from_config
    from v2v_tpu.models.convert import (torch_state_dict_to_flax,
                                        validate_against)

    cfg = load_yaml(args.config)
    model_cfg = cfg["module"]["model"]
    target = model_cfg["target"]
    params_cfg = dict(model_cfg.get("params") or {})
    kind, tol = _FAMILIES.get(target.rsplit(".", 1)[1], ("voxel", 1e-3))
    if args.tol is not None:
        tol = args.tol

    print(f"target {target} [{kind}]  checkpoint {args.checkpoint}")
    tmodel = _ref_class(target)(**params_cfg)
    _to_torch_sd(tmodel, _load_state_dict(args.checkpoint),
                 non_strict=args.non_strict)

    fmodel = instantiate_from_config(model_cfg)
    rng = np.random.RandomState(0)
    ok = True

    if kind == "eraft":
        bins = int(params_cfg.get("n_first_channels", 5))
        h = args.height or 128
        w = args.width or 128
        assert h >= 128 and w >= 128, \
            "ERAFT parity needs >=128px (the 4-level pyramid degenerates)"
        vs = [rng.randn(1, bins, h, w).astype(np.float32)
              for _ in range(args.steps + 1)]
        with torch.no_grad():
            tmodel.reset_states()
            t_flows = [tmodel(torch.tensor(vs[i]),
                              torch.tensor(vs[i + 1])).numpy()
                       for i in range(args.steps)]
        state = fmodel.init_state(1, h, w)
        params0 = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(_nhwc(vs[0])),
                              jnp.asarray(_nhwc(vs[1])), state)
        params = validate_against(
            params0, torch_state_dict_to_flax(tmodel.state_dict()),
            strict=True)
        for i in range(args.steps):
            out, state = fmodel.apply(params, jnp.asarray(_nhwc(vs[i])),
                                      jnp.asarray(_nhwc(vs[i + 1])), state)
            f_flow = np.transpose(np.asarray(out["flow"]), (0, 3, 1, 2))
            ok &= _compare(f"step {i} flow (warm={i > 0})", t_flows[i],
                           f_flow, tol)

    elif kind == "nernet":
        h = args.height or 128
        w = args.width or 160
        tmodel.set_resolution(h, w)
        steps = []
        for _ in range(args.steps):
            n = int(rng.randint(2000, 5000))
            steps.append(np.stack([
                rng.randint(0, w, n).astype(np.float64),
                rng.randint(0, h, n).astype(np.float64),
                np.sort(rng.uniform(0.0, 0.05, n)),
                (rng.randint(0, 2, n) * 2 - 1).astype(np.float64),
                np.zeros(n)], axis=1))
        with torch.no_grad():
            tmodel.reset_states()
            t_outs = [tmodel(torch.tensor(evs.copy()))[0]["image"]
                      [:, :, :h, :w].numpy() for evs in steps]
        state = fmodel.init_state(1, h, w)
        ev0 = jnp.asarray(steps[0], jnp.float32)
        variables = fmodel.init(jax.random.PRNGKey(0), ev0,
                                jnp.int32(len(steps[0])), state)
        params = validate_against(
            variables, torch_state_dict_to_flax(tmodel.state_dict()),
            strict=True)
        for i, evs in enumerate(steps):
            out, state = fmodel.apply(params, jnp.asarray(evs, jnp.float32),
                                      jnp.int32(evs.shape[0]), state)
            f_img = np.transpose(np.asarray(out["image"]), (0, 3, 1, 2))
            ok &= _compare(f"step {i} image", t_outs[i], f_img, tol)

    else:                                   # voxel-in, dict-out models
        kwargs = (params_cfg.get("unet_kwargs")
                  or params_cfg.get("eitr_kwargs") or params_cfg)
        bins = int(kwargs.get("num_bins", 5))
        h = args.height or 64
        w = args.width or 80
        xs = rng.randn(args.steps, 1, bins, h, w).astype(np.float32) * 0.5
        with torch.no_grad():
            tmodel.reset_states()
            t_outs = [{k: v.numpy() for k, v in tmodel(torch.tensor(x)).items()
                       if torch.is_tensor(v)} for x in xs]
        state = fmodel.init_state(1, h, w)
        params0 = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(_nhwc(xs[0])),
                              state)
        params = validate_against(
            params0, torch_state_dict_to_flax(tmodel.state_dict()),
            strict=True)
        for i, x in enumerate(xs):
            out, state = fmodel.apply(params, jnp.asarray(_nhwc(x)), state)
            for k in t_outs[i]:
                f_val = np.transpose(np.asarray(out[k]), (0, 3, 1, 2))
                ok &= _compare(f"step {i} {k}", t_outs[i][k], f_val, tol)

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
