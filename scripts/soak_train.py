"""On-chip training soak: the real `train.py` loop at the flagship
production shape for thousands of steps, with a kill+resume in the
middle — the training-at-scale evidence matching the reference's
80-epoch contract (/root/reference/train.py:121-159,
config/train_v2v_e2vid_10k.yaml:32-44).

What it drives and asserts:
  * a synthetic WebVid corpus (mp4s, the loader's real decode path)
  * the flagship module block verbatim (bf16, LPIPS-VGG, TC with
    RAFT-small teacher) across TWO train stages (a stage boundary)
    with a StepLR whose gamma actually bites (an LR-schedule boundary)
  * val + preview + checkpoint every epoch (the ckpt_paths protocol)
  * one SIGKILL mid-epoch after several checkpoints, then a restart
    that must resume from the last ckpt_paths line and run to the end
  * host RSS sampled throughout (leak detection), loss trajectory
    parsed from the real stdout, LR changes observed in the log

Outputs soak_summary.json + a markdown table for docs/PERF.md into the
workdir. Exit code 0 only if every assertion holds (losses finite and
trending down, resume happened at the right epoch, RSS bounded).

Usage (TPU, ~1.5-2h wall on the 1-core dev host — decode-bound):
    timeout 10000 python -u scripts/soak_train.py --workdir /tmp/soak
Smoke (CPU, minutes):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -u scripts/soak_train.py --workdir /tmp/soak_smoke \
        --smoke
"""
import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))


def make_corpus(root, n_videos, frames, h, w):
    """Synthetic WebVid-style mp4s (same generator as bench_loader)."""
    from bench_loader import make_videos
    os.makedirs(root, exist_ok=True)
    return make_videos(root, n_videos=n_videos, frames=frames, h=h, w=w)


def make_config(workdir, corpus_root, video_list, val_h5_list, smoke,
                scale=1):
    """Flagship module block verbatim; two stages; biting StepLR.
    `scale` multiplies the stage epoch counts (and the StepLR period)
    for long soaks: scale=5 -> 30+20 epochs = ~10,500 steps at the
    standard corpus (210 steps/epoch)."""
    from v2v_tpu.config import load_yaml
    base = load_yaml(os.path.join(REPO, "configs",
                                  "train_v2v_e2vid_10k.yaml"))
    if smoke:
        # tiny model/shape so the CPU smoke runs in minutes; the RAFT
        # teacher stays ON (random-init) — the phase-2 resume crash of
        # the first on-chip soak lived in the teacher's lazy cache fill
        uk = base["module"]["model"]["params"]["unet_kwargs"]
        uk["base_num_channels"] = 4
        uk["num_residual_blocks"] = 1
        base["module"]["loss"]["lpips_weight"] = 0.0
        base["module"]["loss"]["temporal_consistency_L0"] = 2

    dtrain = dict(base["train_stages"][0]["dataset"]["train"][0])
    root_file = os.path.join(workdir, "webvid_root.txt")
    with open(root_file, "w") as f:
        f.write(corpus_root + "\n")
    dtrain.update({
        "data_file": root_file,
        "video_list_file": video_list,
        "step_size": 1,
        "max_samples_per_shot": 20 if smoke else 84,
    })
    if smoke:
        dtrain.update({"sequence_length": 8, "crop_size": 32})

    dval = {"data_file": val_h5_list,
            "class_name": "data.testh5.TestH5Dataset",
            "dataset_name": "hqf", "num_bins": 5,
            "sequence_length": 8 if smoke else 16,
            "interpolate_bins": False, "image_range": 1}

    def stage(name, epochs, lr, step_size, gamma):
        ds = dict(base["train_stages"][0]["dataset"])
        ds.update({"train": [dtrain], "val": [dval],
                   "train_batch_size": 2 if smoke else 12,
                   "num_workers": 2 if smoke else 8})
        return {
            "stage_name": name, "max_epochs": epochs,
            "optimizer": {"target": "torch.optim.Adam",
                          "params": {"lr": lr, "weight_decay": 0,
                                     "amsgrad": True}},
            "lr_scheduler": {
                "target": "torch.optim.lr_scheduler.StepLR",
                "params": {"step_size": step_size, "gamma": gamma}},
            "dataset": ds,
        }

    cfg = {
        "experiment_name": "soak_e2vid",
        "check_val_every_n_epoch": 1,
        "test_output_dir": os.path.join(workdir, "results"),
        "module": base["module"],
        # stage1: 6 epochs, LR halves at epoch 3 (the LR boundary);
        # stage2: fresh optimizer at a lower LR (the stage boundary)
        "train_stages": [stage("stage1", 2 if smoke else 6 * scale,
                               1e-4, 1 if smoke else 3 * scale, 0.5),
                         stage("stage2", 2 if smoke else 4 * scale,
                               3e-5, 10 * scale, 1.0)],
    }
    path = os.path.join(workdir, "soak_config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


LOSS_RE = re.compile(
    r"epoch (\d+) step (\d+)/(\d+) loss=([-\d.naif]+) \(([\d.]+) steps/s\)")
EPOCH_RE = re.compile(
    r"Stage (\d+), epoch (\d+): (\d+) steps in ([\d.]+)s, loss=([-\d.naif]+)")
LR_RE = re.compile(r"Stage (\d+), epoch (\d+): lr=([\d.e+-]+)")
RESUME_RE = re.compile(r"Resumed from (.*) at epoch (\d+)")


def run_phase(cmd, cwd, log_path, kill_after_epochs=None,
              rss_samples=None, timeout_s=9000, poll_s=5.0):
    """Run train.py, streaming stdout to log_path; sample child RSS.
    If kill_after_epochs is set, SIGKILL the child once that many
    'Stage N, epoch E: k steps' summary lines appeared AND the next
    epoch's start marker (the lr= line) is in the log — i.e. mid-epoch,
    after the last checkpoint, the harshest resume case."""
    log = open(log_path, "ab")
    proc = subprocess.Popen(cmd, cwd=cwd, stdout=log,
                            stderr=subprocess.STDOUT)
    t0 = time.time()
    last_flush = t0
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc, False
        # abort-resilience: the rss series lives in driver memory; if
        # the driver itself is timeout-killed, soak_progress.json keeps
        # the evidence (train_log.txt already persists the loss side)
        if rss_samples and time.time() - last_flush > 60:
            last_flush = time.time()
            try:
                with open(os.path.join(cwd, "soak_progress.json"),
                          "w") as f:
                    json.dump({"elapsed_s": round(time.time() - t0, 1),
                               "rss_series": rss_samples[::6],
                               "rss_mb_peak": max(v for _, v
                                                  in rss_samples)}, f)
            except OSError:
                pass
        if time.time() - t0 > timeout_s:
            proc.kill()
            proc.wait()
            raise TimeoutError(f"phase exceeded {timeout_s}s")
        try:
            with open(f"/proc/{proc.pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        rss_samples.append(
                            (round(time.time() - t0, 1),
                             int(line.split()[1]) // 1024))
                        break
        except OSError:
            pass
        if kill_after_epochs is not None:
            text = open(log_path, errors="replace").read()
            done = len(EPOCH_RE.findall(text))
            started_next = [m for m in LR_RE.finditer(text)
                            if int(m.group(2)) >= kill_after_epochs]
            if done >= kill_after_epochs and started_next:
                time.sleep(poll_s)      # let a few steps of the epoch run
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                return -9, True
        time.sleep(poll_s)


def quality_probe(wd, n_ckpts=None):
    """Score every ckpt_paths checkpoint on the FIXED val clip with
    MSE/SSIM — LPIPS-free metrics, so the trend is meaningful even with
    the random-feature LPIPS fallback this box forces (the val loss is
    not). Returns [(epoch, mse, ssim)] oldest-first."""
    import jax
    import jax.numpy as jnp

    from v2v_tpu.config import load_yaml
    from v2v_tpu.eval.metrics import mse as mse_fn, ssim as ssim_fn
    from v2v_tpu.training.checkpoint import all_ckpt_paths, load_params_only
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.steps import make_eval_step
    from v2v_tpu.data.h5 import TestH5Dataset

    cfg = load_yaml(os.path.join(wd, "soak_config.yaml"))
    iface = ModelInterface(cfg["module"])
    ds_cfg = cfg["train_stages"][0]["dataset"]["val"][0]
    ds = TestH5Dataset(os.path.join(wd, "val_seq.h5"), dict(ds_cfg))
    item = ds[0]
    events = jnp.asarray(item["events"])[None]       # (1,T,H,W,bins)
    frames = np.asarray(item["frame"])[None]
    b, _, h, w, _ = events.shape
    params0, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    eval_step = make_eval_step(iface)
    paths = all_ckpt_paths("soak_e2vid", wd)
    if n_ckpts:
        paths = paths[-n_ckpts:]
    out = []
    for path in paths:
        # the training child runs with cwd=wd, so the ckpt_paths file
        # records paths relative to wd ("./checkpoints/...")
        if not os.path.isabs(path):
            path = os.path.join(wd, path)
        params = load_params_only(path, params0)
        state = iface.init_state(b, h, w)
        pred, _ = eval_step(params, events, state)
        pred = np.asarray(pred, np.float32)
        m = float(np.mean([mse_fn(pred[0, t], frames[0, t])
                           for t in range(pred.shape[1])]))
        s = float(np.mean([ssim_fn(pred[0, t, ..., 0] * 2 - 1,
                                   frames[0, t, ..., 0] * 2 - 1)
                           for t in range(pred.shape[1])]))
        ep = int(re.search(r"epoch_(\d+)", path).group(1))
        out.append((ep, m, s))
        print(f"quality probe: epoch {ep} MSE={m:.5f} SSIM={s:.4f}",
              flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU — driver logic test")
    ap.add_argument("--kill-after-epochs", type=int, default=None,
                    help="SIGKILL mid-epoch after this many epochs "
                         "(default: 1 smoke / 4 soak)")
    ap.add_argument("--finish-only", action="store_true",
                    help="skip the kill phase: resume the existing "
                         "workdir's run to completion and evaluate "
                         "(continuation after a driver/timeout abort; "
                         "the log must already contain the kill+resume)")
    ap.add_argument("--scale", type=int, default=1,
                    help="multiply stage epochs (5 -> ~10.5k steps)")
    ap.add_argument("--malloc-arena-max", type=int, default=None,
                    help="set MALLOC_ARENA_MAX for the train child "
                         "(glibc per-thread arena retention mitigation "
                         "— scripts/diag_rss.py names the owner)")
    ap.add_argument("--corpus-hw", default="256x340",
                    help="synthetic source-video resolution HxW. The "
                         "1-core dev host is DECODE-bound (0.56 steps/s "
                         "at 256x340, bench_loader.py); smaller sources "
                         "cut harness wall-clock without touching the "
                         "device contract (B=12, 128^2 crops, T=40 — "
                         "webvid.py's min_resize_scale self-adjusts to "
                         "any source size). Decode scaling remains "
                         "bench_loader.py's story.")
    ap.add_argument("--segment-epochs", type=int, default=None,
                    help="kill+resume the train child every N epochs. "
                         "Bounds host RSS on the axon relay, whose "
                         "client natively retains EVERY host->device "
                         "transfer buffer (diag_rss.py: +39.5 MB/step, "
                         "1:1 with bytes shipped, malloc_trim-immune) — "
                         "RSS ceiling ~= baseline + N*steps_per_epoch*"
                         "batch_MB per segment. Also exercises resume "
                         "at every boundary.")
    args = ap.parse_args()
    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    kill_after = args.kill_after_epochs or (1 if args.smoke else 4)

    corpus = os.path.join(wd, "webvid")
    if not os.path.exists(os.path.join(corpus, "list.txt")):
        print("generating corpus ...", flush=True)
        if args.smoke:
            video_list = make_corpus(corpus, n_videos=3, frames=60,
                                     h=48, w=64)
        else:
            # 30 videos x 84 samples = 2520 samples -> 210 steps/epoch
            # at B=12; 10 epochs = 2100 steps
            ch, cw = (int(x) for x in args.corpus_hw.split("x"))
            video_list = make_corpus(corpus, n_videos=30, frames=420,
                                     h=ch, w=cw)
    else:
        video_list = os.path.join(corpus, "list.txt")

    from test_data import make_hqf_h5
    val_h5 = os.path.join(wd, "val_seq.h5")
    if not os.path.exists(val_h5):
        make_hqf_h5(val_h5, n_frames=17, h=48, w=64,
                    events_per_frame=400)
    val_list = os.path.join(wd, "val_list.txt")
    with open(val_list, "w") as f:
        f.write(val_h5 + "\n")

    cfg_path = make_config(wd, corpus, video_list, val_list, args.smoke,
                           scale=args.scale)
    log_path = os.path.join(wd, "train_log.txt")
    rss = []
    wdir = os.environ.get("V2V_WEIGHTS_DIR", "pretrained")
    if not os.path.exists(os.path.join(wdir, "raft_small.pth")):
        # no pretrained teacher on this box: random-init fallback
        # (identical compute/memory; loss self-consistent only)
        os.environ["V2V_RANDOM_TEACHER"] = "1"
    if args.malloc_arena_max is not None:
        os.environ["MALLOC_ARENA_MAX"] = str(args.malloc_arena_max)
    # segment restarts and the kill+resume repay the fused-step compile
    # (minutes on the axon relay) unless the persistent compile cache
    # catches them; default it into the workdir (opt-out: set it empty)
    if "V2V_COMPILE_CACHE" not in os.environ:
        os.environ["V2V_COMPILE_CACHE"] = os.path.join(wd, "xla_cache")
    elif not os.environ["V2V_COMPILE_CACHE"]:
        del os.environ["V2V_COMPILE_CACHE"]
    cmd = [sys.executable, "-u", os.path.join(REPO, "train.py"), cfg_path]

    poll = 0.5 if args.smoke else 5.0
    if not args.finish_only:
        print(f"phase 1: train until mid-epoch-{kill_after} kill",
              flush=True)
        rc1, killed = run_phase(cmd, wd, log_path,
                                kill_after_epochs=kill_after,
                                rss_samples=rss, poll_s=poll)
        assert killed and rc1 == -9, \
            f"phase 1 ended rc={rc1} killed={killed}"
        print("phase 1 killed as planned; phase 2: resume to completion",
              flush=True)
    n_segments = 0
    if args.segment_epochs:
        # segmented run-to-completion: each segment is a fresh process
        # resumed from the last checkpoint, so the relay client's
        # per-transfer host retention resets with it
        while True:
            text = (open(log_path, errors="replace").read()
                    if os.path.exists(log_path) else "")
            done = len(EPOCH_RE.findall(text))
            rc2, killed = run_phase(
                cmd, wd, log_path,
                kill_after_epochs=done + args.segment_epochs,
                rss_samples=rss, poll_s=poll)
            if not killed:
                assert rc2 == 0, f"segmented run exited rc={rc2}"
                break
            n_segments += 1
            print(f"segment {n_segments}: restarted after epoch "
                  f"{done + args.segment_epochs} (relay-RSS cap)",
                  flush=True)
    else:
        rc2, _ = run_phase(cmd, wd, log_path, rss_samples=rss,
                           poll_s=poll)
        assert rc2 == 0, f"resume run exited rc={rc2}"

    # ---- parse + assert -------------------------------------------------
    text = open(log_path, errors="replace").read()
    steps = [(int(m.group(1)), int(m.group(2)), float(m.group(4)),
              float(m.group(5))) for m in LOSS_RE.finditer(text)]
    epochs = [(int(m.group(1)), int(m.group(2)), int(m.group(3)),
               float(m.group(4)), float(m.group(5)))
              for m in EPOCH_RE.finditer(text)]
    lrs = sorted({(int(m.group(2)), float(m.group(3)))
                  for m in LR_RE.finditer(text)})
    resumes = RESUME_RE.findall(text)
    val_lines = open(os.path.join(
        wd, "tensorboard_logs", "soak_e2vid", "val_loss.txt")).readlines()

    # step-granular losses when epochs are >=50 steps (the print
    # cadence); epoch-summary losses otherwise (smoke)
    losses = [l for (_, _, l, _) in steps]
    epoch_losses = [l for (_, _, _, _, l) in epochs]
    assert all(np.isfinite(losses + epoch_losses)), "non-finite loss"
    if len(losses) < 6:
        losses = epoch_losses
    # exactly one planned resume; --finish-only continuations add more
    assert len(resumes) >= 1, "no resume found in log"
    resume_epoch = int(resumes[0][1])
    assert resume_epoch == kill_after, \
        f"resumed at epoch {resume_epoch}, expected {kill_after}"
    n_lr = len({lr for (_, lr) in lrs})
    assert n_lr >= 3, f"expected >=3 distinct LRs (StepLR + stage2): {lrs}"
    total_steps = sum(e[2] for e in epochs)
    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert last < first, f"loss did not trend down: {first} -> {last}"
    rss_vals = [v for (_, v) in rss]
    rss_peak = max(rss_vals)
    rss_p1 = max(rss_vals[:max(1, len(rss_vals) // 4)])
    quality = quality_probe(wd)
    if len(quality) >= 3:
        # LPIPS-free trend: the fixed clip's MSE must improve start->end
        q_first = np.mean([m for (_, m, _) in quality[:2]])
        q_last = np.mean([m for (_, m, _) in quality[-2:]])
        assert q_last < q_first, \
            f"probe MSE did not improve: {q_first:.5f} -> {q_last:.5f}"
    summary = {
        "quality_by_epoch": quality,
        "malloc_arena_max": args.malloc_arena_max,
        "segment_epochs": args.segment_epochs,
        "n_segments": n_segments,
        "rss_series": rss[::6],        # ~30s grain, phase-relative time
        "total_steps": total_steps,
        "epochs": len(epochs),
        "resume_epoch": resume_epoch,
        "loss_first3_mean": float(first),
        "loss_last3_mean": float(last),
        "val_losses": [float(l.rsplit(":", 1)[1]) for l in val_lines],
        "lr_by_epoch": lrs,
        "steps_per_sec_last": steps[-1][3] if steps else None,
        "rss_mb_peak": rss_peak,
        "rss_mb_first_quarter_peak": rss_p1,
        "loss_by_step": [(e * 1000 + s, l) for (e, s, l, _) in steps],
    }
    with open(os.path.join(wd, "soak_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("loss_by_step", "rss_series")},
                     indent=1), flush=True)
    print("SOAK OK", flush=True)


if __name__ == "__main__":
    main()
