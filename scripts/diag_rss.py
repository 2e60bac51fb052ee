"""Host-RSS attribution for the training loop (round-3 soak finding:
2.5 -> 35.9 GB unattributed climb over 2,100 steps, docs/PERF.md).

The soak's inner loop has three independently-leakable layers; this
driver runs each ISOLATED in its own fresh process and samples RSS +
tracemalloc so the owner is named, not guessed:

    loader    decode/collate only (cv2 mp4 decode, augmentation, numpy
              batch assembly) — no JAX device contact, CPU backend
    transfer  ship the SAME pinned uint8 batch to the device over and
              over (shard_batch + a trivial jitted sum as the sync) —
              isolates the relay client's transfer path
    step      the full fused train step on ONE preloaded device batch —
              isolates XLA execution/output buffers, optimizer donation
    full      loader + transfer + step (the soak's loop, condensed)

For each phase the driver prints a `RSS series` line (MB every
`--sample-every` iterations), a tracemalloc python-heap figure, and the
native residual (RSS - python heap): a climb that tracemalloc cannot
see lives in C/C++ allocations (relay client, cv2, XLA host buffers).

Usage (TPU; each phase is a subprocess so baselines are clean):
    timeout 3000 python -u scripts/diag_rss.py --iters 300
    timeout 3000 python -u scripts/diag_rss.py --phases transfer,step
CPU smoke:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -u scripts/diag_rss.py --smoke --iters 20
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def _malloc_trim() -> float:
    """gc + glibc malloc_trim(0), then RSS. If RSS collapses here, the
    'leak' is freed-but-unreturned heap (glibc per-thread arenas holding
    the 31 MB batch allocations — bounded by MALLOC_ARENA_MAX /
    malloc_trim, not a live-object leak)."""
    import ctypes
    import gc
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass
    return rss_mb()


def _report(tag, series, traced_mb):
    first = series[0][1]
    peak = max(v for _, v in series)
    last = series[-1][1]
    trimmed = _malloc_trim()
    print(f"[{tag}] RSS first={first:.0f} last={last:.0f} "
          f"peak={peak:.0f} MB  python-heap={traced_mb:.0f} MB  "
          f"native-residual={last - traced_mb:.0f} MB  "
          f"after-gc+malloc_trim={trimmed:.0f} MB", flush=True)
    print(f"[{tag}] RSS series (iter, MB): "
          + " ".join(f"{i}:{v:.0f}" for i, v in series), flush=True)
    return {"tag": tag, "first_mb": first, "last_mb": last,
            "peak_mb": peak, "python_heap_mb": traced_mb,
            "trimmed_mb": trimmed, "series": series}


def _flagship_shapes(smoke):
    # flagship batch contract: B=12, L=40 groups, 5 bins -> N=201 frames
    if smoke:
        return 4, 3, 32, 32
    return 12, 40, 128, 128


def phase_loader(args):
    """Decode/collate only. Leak candidates: cv2 VideoCapture handles,
    augmentation buffers, the prefetch deque."""
    import tracemalloc

    import numpy as np  # noqa: F401

    from bench_loader import make_videos
    from v2v_tpu.data.interface import DataLoader
    from v2v_tpu.data.webvid import WebvidDataset

    b, seq, h, w = _flagship_shapes(args.smoke)
    corpus = os.path.join(args.workdir, "corpus")
    os.makedirs(corpus, exist_ok=True)
    vids = make_videos(corpus, n_videos=6, frames=240,
                       h=max(h * 2, 192), w=max(w * 2, 256))
    ds = WebvidDataset(corpus, {
        "video_list_file": vids, "sequence_length": seq,
        "num_bins": 5, "crop_size": h, "step_size": 1,
        "max_samples_per_shot": 64, "output": "video"})
    loader = DataLoader(ds, b, shuffle=True,
                        num_workers=max(1, args.workers))
    tracemalloc.start()
    series = [(0, rss_mb())]
    it = 0
    epoch = 0
    while it < args.iters:
        loader.set_epoch(epoch)
        for batch in loader:
            it += 1
            if it % args.sample_every == 0:
                series.append((it, rss_mb()))
            if it >= args.iters:
                break
        epoch += 1
    traced = tracemalloc.get_traced_memory()[0] / 1e6
    top = tracemalloc.take_snapshot().statistics("lineno")[:5]
    for s in top:
        print(f"[loader] top-alloc {s}", flush=True)
    return _report("loader", series, traced)


def phase_transfer(args):
    """Ship the same pinned uint8 batch to the device repeatedly.
    Leak candidate: the axon relay client's transfer buffering (the
    round-3 prime suspect: ~84 GB of uint8 batches over the soak)."""
    import tracemalloc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from v2v_tpu.parallel.mesh import make_mesh, shard_batch

    b, seq, h, w = _flagship_shapes(args.smoke)
    n = seq * 5 + 1
    mesh = make_mesh(1)
    rng = np.random.RandomState(0)
    video = rng.randint(0, 255, (b, n, h, w)).astype(np.uint8)
    batch_bytes = video.nbytes
    # tiny jitted consumer forces the transfer to complete; the float()
    # fetch is the only reliable sync on the relay (CLAUDE.md)
    consume = jax.jit(lambda v: jnp.sum(v[0, 0].astype(jnp.float32)))

    tracemalloc.start()
    series = [(0, rss_mb())]
    shipped = 0
    for it in range(1, args.iters + 1):
        video[0, 0, 0, 0] = it % 251    # defeat any content-hash cache
        dev = shard_batch({"video": video}, mesh)
        float(consume(dev["video"]))
        shipped += batch_bytes
        del dev
        if it % args.sample_every == 0:
            series.append((it, rss_mb()))
    traced = tracemalloc.get_traced_memory()[0] / 1e6
    print(f"[transfer] shipped {shipped / 1e9:.1f} GB total "
          f"({batch_bytes / 1e6:.1f} MB/iter)", flush=True)
    out = _report("transfer", series, traced)
    out["shipped_gb"] = shipped / 1e9
    return out


def phase_step(args):
    """Full fused train step on ONE preloaded device batch (no loader,
    no per-iter transfer). Leak candidates: XLA output buffers the
    relay client retains, optimizer-donation bookkeeping, jit caches."""
    import tracemalloc

    import jax
    import numpy as np

    from v2v_tpu.config import load_yaml
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.steps import make_train_step
    from v2v_tpu.training.train import make_optimizer

    cfg = load_yaml(os.path.join(REPO, "configs",
                                 "train_v2v_e2vid_10k.yaml"))
    module = cfg["module"]
    if args.smoke:
        uk = module["model"]["params"]["unet_kwargs"]
        uk["base_num_channels"] = 4
        uk["num_residual_blocks"] = 1
        module["loss"]["lpips_weight"] = 0.0
        module["loss"]["temporal_consistency_L0"] = 2
    os.environ.setdefault("V2V_RANDOM_TEACHER", "1")
    b, seq, h, w = _flagship_shapes(args.smoke)
    iface = ModelInterface(module)
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    opt_spec = make_optimizer(cfg["train_stages"][0]["optimizer"])
    opt = opt_spec.make()
    opt_state = opt.init(params)
    mesh = make_mesh(1)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    n = seq * 5 + 1
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "video": rng.randint(0, 255, (b, n, h, w)).astype(np.uint8),
        "data_source_idx": np.full((b,), 11, np.int32),
    }, mesh)
    step = make_train_step(iface, opt, sim_cfg=SimConfig())

    tracemalloc.start()
    series = [(0, rss_mb())]
    for it in range(1, args.iters + 1):
        params, opt_state, loss, aux = step(
            params, opt_state, batch, jax.random.fold_in(
                jax.random.PRNGKey(1), it))
        if it % args.sample_every == 0:
            float(loss)              # sync so buffers actually settle
            series.append((it, rss_mb()))
    print(f"[step] final loss {float(loss):.4f}", flush=True)
    traced = tracemalloc.get_traced_memory()[0] / 1e6
    return _report("step", series, traced)


def phase_full(args):
    """loader + transfer + step: the condensed soak loop. If this
    climbs where the isolated phases stay flat, the interaction (e.g.
    the prefetch deque holding device handles) owns the bytes."""
    import tracemalloc

    import jax
    import numpy as np

    from bench_loader import make_videos
    from v2v_tpu.config import load_yaml
    from v2v_tpu.data.interface import DataLoader
    from v2v_tpu.data.webvid import WebvidDataset
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.steps import make_train_step
    from v2v_tpu.training.train import make_optimizer

    b, seq, h, w = _flagship_shapes(args.smoke)
    corpus = os.path.join(args.workdir, "corpus_full")
    os.makedirs(corpus, exist_ok=True)
    vids = make_videos(corpus, n_videos=6, frames=240,
                       h=max(h * 2, 192), w=max(w * 2, 256))
    ds = WebvidDataset(corpus, {
        "video_list_file": vids, "sequence_length": seq,
        "num_bins": 5, "crop_size": h, "step_size": 1,
        "max_samples_per_shot": 64, "output": "video"})
    loader = DataLoader(ds, b, shuffle=True,
                        num_workers=max(1, args.workers))

    cfg = load_yaml(os.path.join(REPO, "configs",
                                 "train_v2v_e2vid_10k.yaml"))
    module = cfg["module"]
    if args.smoke:
        uk = module["model"]["params"]["unet_kwargs"]
        uk["base_num_channels"] = 4
        uk["num_residual_blocks"] = 1
        module["loss"]["lpips_weight"] = 0.0
        module["loss"]["temporal_consistency_L0"] = 2
    os.environ.setdefault("V2V_RANDOM_TEACHER", "1")
    iface = ModelInterface(module)
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    opt = make_optimizer(cfg["train_stages"][0]["optimizer"]).make()
    opt_state = opt.init(params)
    mesh = make_mesh(1)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    step = make_train_step(iface, opt, sim_cfg=SimConfig())

    tracemalloc.start()
    series = [(0, rss_mb())]
    it = 0
    epoch = 0
    loss = None
    while it < args.iters:
        loader.set_epoch(epoch)
        for item in loader:
            item = dict(item)
            for k in list(item):
                if not isinstance(item[k], np.ndarray):
                    item.pop(k)
            batch = shard_batch(item, mesh)
            it += 1
            params, opt_state, loss, aux = step(
                params, opt_state, batch,
                jax.random.fold_in(jax.random.PRNGKey(1), it))
            if it % args.sample_every == 0:
                float(loss)
                series.append((it, rss_mb()))
            if it >= args.iters:
                break
        epoch += 1
    print(f"[full] final loss {float(loss):.4f}", flush=True)
    traced = tracemalloc.get_traced_memory()[0] / 1e6
    return _report("full", series, traced)


PHASES = {"loader": phase_loader, "transfer": phase_transfer,
          "step": phase_step, "full": phase_full}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--phases", default="loader,transfer,step,full")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--sample-every", type=int, default=10)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/diag_rss")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--child", help="(internal) run one phase inline")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if args.child:
        if args.child == "loader":
            # never let the loader phase touch the TPU
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            os.environ["JAX_PLATFORMS"] = "cpu"
        out = PHASES[args.child](args)
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(out, f)
        return

    os.makedirs(args.workdir, exist_ok=True)
    results = {}
    for phase in args.phases.split(","):
        phase = phase.strip()
        jout = os.path.join(args.workdir, f"{phase}.json")
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--child", phase, "--iters", str(args.iters),
               "--sample-every", str(args.sample_every),
               "--workers", str(args.workers),
               "--workdir", args.workdir, "--json-out", jout]
        if args.smoke:
            cmd.append("--smoke")
        print(f"\n=== phase {phase} ===", flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc == 0 and os.path.isfile(jout):
            results[phase] = json.load(open(jout))
        else:
            print(f"phase {phase}: FAILED rc={rc}", flush=True)
    summary = os.path.join(args.workdir, "diag_rss_summary.json")
    with open(summary, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {summary}", flush=True)
    for tag, r in results.items():
        growth = r["last_mb"] - r["first_mb"]
        print(f"  {tag:9s} growth {growth:+8.0f} MB "
              f"(python heap {r['python_heap_mb']:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
