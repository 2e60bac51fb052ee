"""Release acceptance kit: ONE command from an assets directory to the
within-1% table (BASELINE.md acceptance; reference
utils/metric_references.py:208-236, test_e2vid.py:100-108).

    v2v-validate-release --assets DIR [--out DIR] [--families f1,f2]
        [--datasets hqf,ijrr] [--max-batches N] [--tol 0.01]
        [--allow-random-init] [--fetch]

--fetch self-provisions every PUBLIC auxiliary weight (LPIPS trunks +
RAFT teachers — all torchvision assets, sha256-checked against the hash
embedded in the torchvision filename) into DIR/weights/, so a networked
machine-day needs only DIR/checkpoints/ + DIR/h5/. Offline (default) is
unchanged.

Assets layout (any subset; missing pieces are reported and skipped):

    DIR/checkpoints/{e2vid++,etnet,hyper,eraft,evflow,nernet}.pth
        released torch checkpoints (reference ckpt_paths/*.txt targets)
    DIR/h5/{HQF,IJRR,MVSEC,EVAID}/{sequence}.h5
        unified HQF-format benchmarks (scripts/{mvsec,ijrr,...}_to_h5.py)
    DIR/weights/{vgg16,alexnet,squeezenet,raft_small,raft_large}.pth
        LPIPS trunks + RAFT teacher (exported by scripts/validate_raft.py
        / torchvision state_dicts) — becomes $V2V_WEIGHTS_DIR

For each family the kit converts the .pth with the framework converter
(strict schema match), runs the full test driver (e2vid or flow task)
over every available dataset, and prints the per-sequence deltas against
the reference regression table (metric_references.json) for the families
that have published rows (e2vid++ -> "e2vid+", etnet -> "ETNet").
Exit code: 0 = every compared row within tol, 2 = acceptance failures,
1 = nothing could run.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import Any, Dict, List, Optional, Tuple

# family -> (config file, task, reference-table method name or None)
FAMILIES: Dict[str, Tuple[str, str, Optional[str]]] = {
    "e2vid++": ("test_e2vid++_original.yaml", "e2vid", "e2vid+"),
    "etnet": ("test_etnet_original.yaml", "e2vid", "ETNet"),
    "hyper": ("test_hypere2vid_original.yaml", "e2vid", None),
    "nernet": ("test_nernet_original.yaml", "e2vid", None),
    "eraft": ("test_eraft_original.yaml", "flow", None),
    "evflow": ("test_evflow_original.yaml", "flow", None),
}
DATASETS = ("hqf", "ijrr", "mvsec", "evaid")


# ---- public-weight self-provisioning (--fetch) -------------------------
#
# Every auxiliary weight the machine-day needs (LPIPS trunks + RAFT
# teachers) is a public torchvision asset; only the model-family
# checkpoints (DIR/checkpoints/*.pth) are the reference authors'. The
# manifest pins the torchvision download URLs and their sha256 prefixes
# (the 8-hex suffix in a torchvision filename IS the first 8 chars of
# the file's sha256 — torch.hub's integrity convention), so a fetched
# file is checksummed before it is trusted. Offline stays the default;
# the downloader is injectable for tests (zero-egress environments).
#
# Targets (reference usage):
#   LPIPS trunks       PerceptualSimilarity/models/dist_model.py:28-113
#   RAFT teachers      model/train_utils.py:21-79 (torchvision
#                      raft_small/raft_large default weights)
WEIGHT_MANIFEST: Dict[str, Tuple[str, str]] = {
    # dest filename (what losses/lpips.py + training/raft.py look up)
    #   -> (download URL, sha256 8-hex prefix from the filename)
    "alexnet-owt-7be5be79.pth": (
        "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth",
        "7be5be79"),
    "vgg16-397923af.pth": (
        "https://download.pytorch.org/models/vgg16-397923af.pth",
        "397923af"),
    "squeezenet1_1-b8a52dc0.pth": (
        "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth",
        "b8a52dc0"),
    # torchvision optical-flow defaults (Raft_Small_Weights.C_T_V2 /
    # Raft_Large_Weights.C_T_SKHT_V2) renamed to the teacher's lookup
    # names (training/raft.py:_BACKBONES)
    "raft_small.pth": (
        "https://download.pytorch.org/models/"
        "raft_small_C_T_V2-01064c6c.pth", "01064c6c"),
    "raft_large.pth": (
        "https://download.pytorch.org/models/"
        "raft_large_C_T_SKHT_V2-ff5fadd5.pth", "ff5fadd5"),
}


def _manifest_with_torchvision() -> Dict[str, Tuple[str, str]]:
    """Prefer torchvision's own weight-enum URLs when importable (tracks
    any upstream re-hosting); fall back to the pinned manifest."""
    man = dict(WEIGHT_MANIFEST)
    try:
        from torchvision.models import (AlexNet_Weights, VGG16_Weights,
                                        SqueezeNet1_1_Weights)
        from torchvision.models.optical_flow import (Raft_Large_Weights,
                                                     Raft_Small_Weights)
        for dest, url in (
                ("alexnet-owt-7be5be79.pth",
                 AlexNet_Weights.IMAGENET1K_V1.url),
                ("vgg16-397923af.pth", VGG16_Weights.IMAGENET1K_V1.url),
                ("squeezenet1_1-b8a52dc0.pth",
                 SqueezeNet1_1_Weights.IMAGENET1K_V1.url),
                ("raft_small.pth", Raft_Small_Weights.C_T_V2.url),
                ("raft_large.pth", Raft_Large_Weights.C_T_SKHT_V2.url)):
            # the hash prefix travels in the URL's filename
            base = url.rsplit("/", 1)[-1]
            prefix = base.rsplit("-", 1)[-1].split(".")[0]
            man[dest] = (url, prefix)
    except Exception:
        pass
    return man


def _default_downloader(url: str, dest: str) -> None:
    import urllib.request
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=120) as r, \
            open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, dest)


def fetch_weights(wdir: str, downloader=None,
                  manifest: Optional[Dict[str, Tuple[str, str]]] = None,
                  ) -> Dict[str, str]:
    """Download any missing public auxiliary weights into `wdir`,
    verifying each file's sha256 against the torchvision hash prefix.
    Returns {filename: status} with status in
    {'present', 'fetched', 'failed', 'checksum-mismatch'}. Never raises
    on a network failure — the kit degrades to its offline behavior
    (loud random-feature fallbacks) exactly as before."""
    import hashlib

    downloader = downloader or _default_downloader
    manifest = manifest if manifest is not None \
        else _manifest_with_torchvision()
    os.makedirs(wdir, exist_ok=True)
    status: Dict[str, str] = {}
    for dest, (url, prefix) in manifest.items():
        path = os.path.join(wdir, dest)
        if os.path.isfile(path):
            status[dest] = "present"
            continue
        try:
            downloader(url, path)
        except Exception as e:
            print(f"[fetch] {dest}: download failed ({e})")
            status[dest] = "failed"
            continue
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        digest = h.hexdigest()
        if not digest.startswith(prefix):
            os.remove(path)
            print(f"[fetch] {dest}: sha256 {digest[:8]} != expected "
                  f"{prefix} — discarded")
            status[dest] = "checksum-mismatch"
            continue
        print(f"[fetch] {dest}: ok (sha256 {digest[:8]}...)")
        status[dest] = "fetched"
    return status


# measured B=1 stateful streaming latency, f32, TPU v5e (docs/PERF.md
# "Streaming-eval (serving) latency" table + the ETNet 720p flash-
# attention figure). Used only by the --budget projection.
SERVING_MS_PER_FRAME: List[Tuple[str, int, int, float]] = [
    ("e2vid++", 180, 240, 1.49), ("e2vid++", 260, 346, 2.80),
    ("etnet", 180, 240, 2.11), ("etnet", 720, 1280, 221.0),
    ("hyper", 180, 240, 1.68), ("hyper", 260, 346, 3.32),
    ("eraft", 260, 346, 5.27),
    ("evflow", 180, 240, 1.16), ("evflow", 260, 346, 1.93),
]


def _ms_per_frame(family: str, h: int, w: int) -> Tuple[float, bool]:
    """(ms/frame, is_estimate). Unmeasured (family, resolution) points
    scale the family's nearest measured point linearly in pixel count;
    unmeasured families proxy through the e2vid++ UNet row (marked as
    estimates either way)."""
    pts = [p for p in SERVING_MS_PER_FRAME if p[0] == family]
    est = False
    if not pts:
        pts = [p for p in SERVING_MS_PER_FRAME if p[0] == "e2vid++"]
        est = True
    exact = [p for p in pts if p[1] == h and p[2] == w]
    if exact and not est:
        return exact[0][3], est
    nearest = min(pts, key=lambda p: abs(p[1] * p[2] - h * w))
    return nearest[3] * (h * w) / (nearest[1] * nearest[2]), True


def _count_frames(assets: str, datasets: List[str]
                  ) -> Dict[str, Tuple[int, int, int, int]]:
    """dataset -> (n_files, n_frames, H, W) over DIR/h5/{DS}/*.h5."""
    import h5py
    out = {}
    for ds in datasets:
        files = sorted(glob.glob(os.path.join(assets, "h5", ds.upper(),
                                              "*.h5")))
        n_frames, h, w = 0, 0, 0
        for path in files:
            try:
                with h5py.File(path, "r") as f:
                    keys = list(f["images"].keys())
                    n_frames += len(keys)
                    if keys and not h:
                        h, w = f["images"][keys[0]].shape[:2]
            except (OSError, KeyError) as e:
                print(f"[budget] unreadable {path}: {e}")
        if files:
            out[ds] = (len(files), n_frames, h, w)
    return out


def _find_rehearsal(explicit: Optional[str]) -> Optional[str]:
    if explicit:
        return explicit if os.path.isfile(explicit) else None
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("rehearsal_r5.json", "rehearsal_r4_partial.json"):
        cand = os.path.join(here, "..", "..", "docs", name)
        if os.path.isfile(cand):
            return os.path.normpath(cand)
    return None


def print_budget(assets: str, families: Optional[List[str]] = None,
                 datasets: Optional[List[str]] = None,
                 rehearsal: Optional[str] = None) -> int:
    """--budget: state the machine-day plan before running it — per
    family, the measured compile/setup minutes from the full-resolution
    rehearsal artifact plus projected eval minutes (frames in the
    assets x the measured serving ms/frame). Reference spirit:
    test_e2vid.py:133-172's skip-if-done bookkeeping (predictable
    machine-days)."""
    families = families or list(FAMILIES)
    datasets = datasets or list(DATASETS)

    rpath = _find_rehearsal(rehearsal)
    rfam: Dict[str, Any] = {}
    if rpath:
        import json as _json
        with open(rpath) as f:
            data = _json.load(f)
        rfam = data.get("families", {})
        print(f"[budget] rehearsal artifact: {rpath} "
              f"(--max-batches {data.get('max_batches')})")
    else:
        print("[budget] no rehearsal artifact found - compile/setup "
              "minutes unknown (run scripts/rehearse_release.py)")

    counts = _count_frames(assets, datasets)
    if not counts:
        print(f"[budget] no h5 datasets under {assets}/h5/")
        return 1
    for ds, (nf, frames, h, w) in sorted(counts.items()):
        print(f"[budget] {ds}: {nf} sequences, {frames} frames "
              f"@ {h}x{w}")

    print(f"\n{'family':10s} {'setup(min)':>12s} {'eval(min)':>10s} "
          f"{'total(min)':>11s}  basis")
    grand = 0.0
    for family in families:
        setup = rfam.get(family, {}).get("minutes")
        setup_s = f"{setup:.1f}" if setup is not None else "?"
        if rfam.get(family, {}).get("rc") not in (0, None):
            setup_s += "!"          # rehearsal did not finish cleanly
        eval_min = 0.0
        any_est = False
        for ds, (nf, frames, h, w) in counts.items():
            ms, est = _ms_per_frame(family, h, w)
            any_est |= est
            eval_min += frames * ms / 60000.0
        total = (setup or 0.0) + eval_min
        grand += total
        basis = ("serving table" if not any_est
                 else "serving table + pixel-scaled estimates")
        print(f"{family:10s} {setup_s:>12s} {eval_min:>10.1f} "
              f"{total:>11.1f}  {basis}")
    print(f"{'TOTAL':10s} {'':>12s} {'':>10s} {grand:>11.1f}  "
          f"(setup '?' rows excluded from their totals; '!' = "
          f"rehearsal rc!=0)")
    print("\nnotes: setup = measured rehearsal wall (compiles + capped "
          "windows, docs/PERF.md);\n  eval = frames x f32 ms/frame "
          "(B=1 streaming, scripts/bench_eval.py); nernet EVAID\n  "
          "compiles once per event bucket - its setup dominates "
          "(rehearsal artifact).")
    return 0


def _find_configs_dir(explicit: Optional[str]) -> str:
    if explicit:
        return explicit
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(os.getcwd(), "configs"),
                 os.path.join(here, "configs")):
        if os.path.isfile(os.path.join(cand, "test_e2vid++_original.yaml")):
            return cand
    raise SystemExit("cannot locate configs/; pass --configs DIR")


def write_lists(assets: str, out: str,
                datasets: List[str]) -> Dict[str, str]:
    """One sidecar list per available dataset dir, listing every .h5 in
    DIR/h5/{DS}/ (registry sequences score against the reference table;
    extra files still run — scripts/generate_test_lists.py is the
    registry-strict variant)."""
    lists = {}
    os.makedirs(os.path.join(out, "lists"), exist_ok=True)
    for ds in datasets:
        ds_dir = os.path.join(assets, "h5", ds.upper())
        files = sorted(glob.glob(os.path.join(ds_dir, "*.h5")))
        if not files:
            print(f"[assets] no h5 under {ds_dir} - skipping {ds}")
            continue
        path = os.path.join(out, "lists", f"{ds}_test.txt")
        with open(path, "w") as f:
            f.write("\n".join(files) + "\n")
        lists[ds] = path
        print(f"[assets] {ds}: {len(files)} sequences")
    return lists


def _restrict_tests(config: Dict[str, Any],
                    lists: Dict[str, str]) -> bool:
    """Point the config's test entries at the generated lists; drop
    datasets without assets. Returns False if nothing remains."""
    kept = []
    for entry in config["test_stage"]["test"]:
        ds = entry.get("dataset_name", "").lower()
        if ds in lists:
            entry = dict(entry, data_file=lists[ds])
            kept.append(entry)
    config["test_stage"]["test"] = kept
    return bool(kept)


def _init_template(task: str, config: Dict[str, Any]):
    """Init a params template for the converter (shapes are
    resolution-independent; num_bins comes from the test entries)."""
    import jax
    import jax.numpy as jnp
    bins = config["test_stage"]["test"][0].get("num_bins", 5)
    if task == "flow":
        from ..training.flow_interface import FlowModelInterface
        iface = FlowModelInterface(config["module"])
        params, _ = iface.init(jax.random.PRNGKey(0), 1, 64, 64, bins)
        return params
    from ..training.interface import ModelInterface
    iface = ModelInterface(config["module"])
    if iface.is_nernet:
        state = iface.model.init_state(1, 64, 64)
        dummy = jnp.zeros((1024, 5), jnp.float32)
        return iface.model.init(jax.random.PRNGKey(0), dummy,
                                jnp.int32(0), state)
    params, _ = iface.init(jax.random.PRNGKey(0), 1, 64, 64, bins)
    return params


def convert_family(family: str, task: str, config: Dict[str, Any],
                   pth: str, out_msgpack: str, strict: bool = True) -> str:
    from ..models.convert import convert_checkpoint
    from ..training.checkpoint import save_checkpoint
    template = _init_template(task, config)
    params = convert_checkpoint(pth, template, strict=strict)
    save_checkpoint(out_msgpack, params, None, epoch=-1,
                    extra={"converted_from": os.path.abspath(pth)})
    print(f"[{family}] converted {pth} -> {out_msgpack}")
    return out_msgpack


def compare_to_reference(family: str, final: Dict[str, float],
                         method: str, tol: float) -> Tuple[int, int]:
    """Per-(sequence, metric) relative deltas vs the published table;
    returns (n_within, n_compared)."""
    from .references import METRIC_REFERENCES
    table = METRIC_REFERENCES[method]
    n_ok = n_tot = 0
    print(f"\n[{family}] acceptance vs '{method}' reference rows "
          f"(tol {tol:.1%}):")
    print(f"  {'sequence/metric':<40} {'ours':>10} {'ref':>10} {'delta':>8}")
    for seq, metrics in table.items():
        for metric, ref_val in metrics.items():
            ours = final.get(f"{seq}/{metric}")
            if ours is None:
                continue
            n_tot += 1
            rel = abs(ours - ref_val) / max(abs(ref_val), 1e-12)
            ok = rel <= tol
            n_ok += ok
            flag = "ok" if ok else "FAIL"
            print(f"  {seq + '/' + metric:<40} {ours:>10.4f} "
                  f"{ref_val:>10.4f} {rel:>7.2%} {flag}")
    print(f"[{family}] {n_ok}/{n_tot} rows within {tol:.1%}")
    return n_ok, n_tot


def validate_release(assets: str, out: str = "release_validation",
                     families: Optional[List[str]] = None,
                     datasets: Optional[List[str]] = None,
                     configs_dir: Optional[str] = None,
                     max_batches: Optional[int] = None, tol: float = 0.01,
                     allow_random_init: bool = False,
                     strict_convert: bool = True,
                     fetch: bool = False, downloader=None) -> int:
    # env-scoped, not process-permanent: a validate_release(...,
    # allow_random_init=True) call must not silently leak the random-
    # teacher opt-in (or this run's weights dir) into later calls in
    # the same process (advisor round-4 finding)
    saved = {k: os.environ.get(k)
             for k in ("V2V_RANDOM_TEACHER", "V2V_WEIGHTS_DIR")}
    if allow_random_init:
        # the dry-run promise covers EVERY missing weight, including the
        # flow families' RAFT pseudo-GT teacher (which otherwise hard-
        # fails the rehearsal): raft.py only uses the random teacher
        # when the .pth is genuinely absent, and warns loudly then.
        os.environ["V2V_RANDOM_TEACHER"] = "1"
    try:
        return _validate_release(
            assets, out, families, datasets, configs_dir, max_batches,
            tol, allow_random_init, strict_convert, fetch, downloader)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _validate_release(assets, out, families, datasets, configs_dir,
                      max_batches, tol, allow_random_init,
                      strict_convert, fetch, downloader) -> int:
    from ..config import load_yaml

    os.makedirs(out, exist_ok=True)
    families = families or list(FAMILIES)
    datasets = datasets or list(DATASETS)

    wdir = os.path.join(assets, "weights")
    if fetch:
        st = fetch_weights(wdir, downloader=downloader)
        print("[fetch] " + ", ".join(f"{k}: {v}"
                                     for k, v in sorted(st.items())))
    if os.path.isdir(wdir):
        os.environ["V2V_WEIGHTS_DIR"] = wdir
        print(f"[assets] V2V_WEIGHTS_DIR={wdir} "
              f"({len(os.listdir(wdir))} files)")
    else:
        print("[assets] no weights/ dir: LPIPS/RAFT fall back to "
              "random features (metrics will NOT match the table)")

    lists = write_lists(assets, out, datasets)
    if not lists:
        print("no datasets available; nothing to run")
        return 1

    failures = 0
    ran = 0
    summary: List[str] = []
    configs_dir = _find_configs_dir(configs_dir)
    for family in families:
        cfg_name, task, method = FAMILIES[family]
        config = load_yaml(os.path.join(configs_dir, cfg_name))
        config["experiment_name"] = f"release_{family}"
        config["test_output_dir"] = os.path.join("results",
                                                 f"release_{family}")
        if not _restrict_tests(config, lists):
            summary.append(f"{family}: skipped (no datasets)")
            continue

        pth = os.path.join(assets, "checkpoints", f"{family}.pth")
        ckpt = None
        if os.path.isfile(pth):
            ckpt = os.path.join(out, "checkpoints",
                                f"release_{family}.msgpack")
            os.makedirs(os.path.dirname(ckpt), exist_ok=True)
            try:
                convert_family(family, task, config, pth, ckpt,
                               strict=strict_convert)
            except Exception as e:
                print(f"[{family}] CONVERSION FAILED: {e}")
                summary.append(f"{family}: conversion failed")
                failures += 1
                continue
        elif not allow_random_init:
            print(f"[{family}] no checkpoint at {pth} - skipping "
                  f"(--allow-random-init to run anyway)")
            summary.append(f"{family}: skipped (no checkpoint)")
            continue
        else:
            print(f"[{family}] no checkpoint: RANDOM INIT dry run")

        if task == "flow":
            from .flow_harness import run_single_test
        else:
            from .harness import run_single_test
        print(f"\n[{family}] running {task} test driver over "
              f"{sorted(lists)} ...")
        final = run_single_test(ckpt, config, max_batches=max_batches,
                                root=out)
        ran += 1

        if method is not None and ckpt is not None:
            n_ok, n_tot = compare_to_reference(family, final, method, tol)
            summary.append(f"{family}: {n_ok}/{n_tot} rows within "
                           f"{tol:.1%}")
            if n_ok < n_tot:
                failures += 1
        else:
            # no published reference row for this family (or random-init
            # run): report the metrics but say loudly that nothing gated
            # them — exit code 0 must not be read as acceptance here
            means: Dict[str, List[float]] = {}
            for k, v in final.items():
                metric = k.rsplit("/", 1)[-1]
                means.setdefault(metric, []).append(v)
            line = " ".join(
                f"{m}={sum(v) / len(v):.4f}" for m, v in sorted(means.items()))
            why = ("random init" if ckpt is None
                   else "no published reference rows")
            summary.append(f"{family}: NOT GATED ({why}) "
                           + (line if line else "no metrics"))

    print("\n=== release validation summary ===")
    gated = sum(": NOT GATED" not in line and "skipped" not in line
                and "failed" not in line for line in summary)
    for line in summary:
        print(" ", line)
    print(f"  [exit code certifies ONLY the {gated} gated "
          f"(reference-compared) families; NOT GATED rows are "
          f"informational]")
    if not ran:
        return 1
    return 2 if failures else 0


def main(argv: Optional[List[str]] = None) -> None:
    # `python -m v2v_tpu.eval.release` must honor V2V_COMPILE_CACHE the
    # same as the v2v-validate-release console command (cli.py) — the
    # rehearsal driver spawns one kit process per family, exactly the
    # fresh-process workflow the cache exists for
    from ..utils.compile_cache import maybe_enable
    maybe_enable()
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--assets", required=True,
                    help="assets dir (checkpoints/ h5/ weights/)")
    ap.add_argument("--out", default="release_validation")
    ap.add_argument("--families",
                    help=f"comma list of {sorted(FAMILIES)}")
    ap.add_argument("--datasets", help=f"comma list of {DATASETS}")
    ap.add_argument("--configs", help="configs dir (default: autodetect)")
    ap.add_argument("--max-batches", type=int,
                    help="cap batches per family (smoke runs)")
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--allow-random-init", action="store_true",
                    help="run families without a .pth at random init")
    ap.add_argument("--no-strict-convert", action="store_true",
                    help="tolerate missing keys (load_state_dict("
                         "strict=False) analog)")
    ap.add_argument("--fetch", action="store_true",
                    help="download missing PUBLIC auxiliary weights "
                         "(LPIPS trunks + RAFT teachers, checksummed "
                         "torchvision state_dicts) into assets/weights/ "
                         "first; offline behavior is unchanged when the "
                         "network is unavailable")
    ap.add_argument("--budget", action="store_true",
                    help="print the projected machine-day plan (per-"
                         "family minutes from the rehearsal artifact + "
                         "assets frame counts x measured serving "
                         "ms/frame) and exit without running")
    ap.add_argument("--rehearsal",
                    help="rehearsal budget json for --budget (default: "
                         "docs/rehearsal_r5.json if present)")
    args = ap.parse_args(argv)

    if args.budget:
        sys.exit(print_budget(
            assets=args.assets,
            families=args.families.split(",") if args.families else None,
            datasets=args.datasets.split(",") if args.datasets else None,
            rehearsal=args.rehearsal))

    rc = validate_release(
        assets=args.assets, out=args.out,
        families=args.families.split(",") if args.families else None,
        datasets=args.datasets.split(",") if args.datasets else None,
        configs_dir=args.configs, max_batches=args.max_batches,
        tol=args.tol, allow_random_init=args.allow_random_init,
        strict_convert=not args.no_strict_convert, fetch=args.fetch)
    sys.exit(rc)


if __name__ == "__main__":
    main()
