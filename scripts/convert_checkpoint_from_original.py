"""Convert foreign/original torch checkpoints for this framework.

Two modes (reference scripts/convert_checkpoint_from_original.py strips
to {"state_dict": ...}; here the full conversion to flax params is also
one command):

  # strip: any torch ckpt -> {"state_dict": ...} .pth
  python scripts/convert_checkpoint_from_original.py strip in.pth out.pth

  # convert: torch ckpt + experiment config -> flax .msgpack
  python scripts/convert_checkpoint_from_original.py convert \
      configs/test_e2vid++_original.yaml in.pth out.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def strip(in_path: str, out_path: str) -> None:
    import torch
    saved = torch.load(in_path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if key in saved:
            sd = saved[key]
            break
    else:
        sd = saved
    torch.save({"state_dict": sd}, out_path)
    print(f"wrote {out_path} ({len(sd)} tensors)")


def convert(config_path: str, in_path: str, out_path: str) -> None:
    import jax
    from v2v_tpu.config import load_yaml
    from v2v_tpu.models.convert import convert_checkpoint
    from v2v_tpu.training.checkpoint import save_checkpoint
    from v2v_tpu.training.interface import ModelInterface

    cfg = load_yaml(config_path)
    iface = ModelInterface(cfg["module"])
    params, _ = iface.init(jax.random.PRNGKey(0), 1, 128, 128,
                           cfg["module"]["model"]["params"]
                           .get("unet_kwargs", {}).get("num_bins", 5))
    params = convert_checkpoint(in_path, params, strict=False)
    save_checkpoint(out_path, params, None, epoch=-1,
                    extra={"converted_from": in_path})
    print(f"wrote {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    s = sub.add_parser("strip")
    s.add_argument("input")
    s.add_argument("output")
    c = sub.add_parser("convert")
    c.add_argument("config")
    c.add_argument("input")
    c.add_argument("output")
    args = p.parse_args()
    if args.mode == "strip":
        strip(args.input, args.output)
    else:
        convert(args.config, args.input, args.output)
