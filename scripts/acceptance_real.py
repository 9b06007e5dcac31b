"""Real-artifact acceptance runbook: one command, pass/fail vs BASELINE.md.

Nothing in this environment has real THINGS-EEG recordings or real
OpenCLIP/SDXL/GIT weights, so end-task parity with the reference cannot be
*demonstrated* here — but it can be made a ONE-COMMAND check for anyone who
has the artifacts. Point this script at

- a preprocessed THINGS-EEG directory (``cli preprocess`` output, or the
  reference's own ``Preprocessed_data_250Hz`` tree — same pickle format),
- the CLIP feature cache (``cli features`` output, or any .npz with
  img_features/text_features[_test]) ,
- (optional) converted SDXL/IP-Adapter + text-encoder params for the
  generation leg, and converted metric backbones for the metric leg,

and it drives the real user path end-to-end through ``cli.main``:

    stage 1  retrieval  train-retrieval sub-01, 40 epochs, bs 1024
             band: final 200-way top-1 in [0.20, 0.40]
             (reference plateau ~0.27-0.30 averaged over subjects,
              BASELINE.md row 1 / imgs/test_acc.png); hard-fail < 0.10
    stage 2  prior      train-prior on the exported features, 150 epochs
             band: final eps-MSE <= 0.18 (reference converges to ~0.142,
             Generation_metrics_sub8.ipynb cell 8); hard-fail > 0.30
    stage 3  generate   200 test classes x N seeds through prior+SDXL
             check: all images written and finite
    stage 4  metrics    the 8-row reconstruction table
             check: all rows finite (the reference commits no values —
             BASELINE.md row 8 — so bands are reported, not asserted)

Every stage appends to ``<work-dir>/acceptance_report.json``; the exit code
is 0 only if no stage hard-fails. ``--dry-run`` fabricates a tiny synthetic
stand-in tree and runs the identical code path with tiny settings and bands
relaxed to "finite + trains" — that mode runs in CI
(``tests/test_acceptance_runbook.py``) so the runbook itself cannot rot.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _latest_results_csv(runs_dir):
    paths = glob.glob(
        os.path.join(runs_dir, "**", "results.csv"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no results.csv under {runs_dir}")
    return max(paths, key=os.path.getmtime)


def _final_row(csv_path):
    import csv

    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    return {k: float(v) for k, v in rows[-1].items() if v not in ("", None)}


def _write_dry_run_tree(work):
    """Tiny synthetic stand-ins in the exact on-disk formats the real
    artifacts use (reference pickle layout + features .npz)."""
    import pickle

    rng = np.random.default_rng(7)
# ipc=10, reps=4: the EEG loader's stored-layout convention
    n_cls, ipc, reps, c, t, d = 10, 10, 4, 63, 250, 1024
    data_dir = os.path.join(work, "data")

    # class-template EEG so retrieval is learnable (the README convergence
    # construction, data/synthetic.py semantics, written as pickles)
    templates = rng.normal(size=(n_cls, c, t)).astype(np.float32)
    for sub in ("sub-01",):
        for split, nrep in (("training", reps), ("test", 6)):
            n_img = ipc if split == "training" else 1
            eeg = (
                templates[:, None, None]
                + 0.3 * rng.normal(size=(n_cls, n_img, nrep, c, t))
            ).astype(np.float32).reshape(n_cls * n_img, nrep, c, t)
            d_out = os.path.join(data_dir, sub)
            os.makedirs(d_out, exist_ok=True)
            with open(
                os.path.join(d_out, f"preprocessed_eeg_{split}.npy"), "wb"
            ) as f:
                pickle.dump(
                    {"preprocessed_eeg_data": eeg,
                     "ch_names": [f"ch{i}" for i in range(c)],
                     "times": np.linspace(0, 1.0, t, endpoint=False)},
                    f, protocol=4,
                )

    cls_feat = rng.normal(size=(n_cls, d)).astype(np.float32)
    cls_feat /= np.linalg.norm(cls_feat, axis=1, keepdims=True)
    img_feat = np.repeat(cls_feat, ipc, axis=0)
    feats = os.path.join(work, "features.npz")
    np.savez(
        feats,
        img_features=img_feat,
        text_features=cls_feat,
        img_features_test=cls_feat,
        text_features_test=cls_feat,
    )

    gt_dir = os.path.join(work, "ground_truth")
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n_cls):
        arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        try:
            from PIL import Image

            Image.fromarray(arr).save(
                os.path.join(gt_dir, f"{i:03d}.png")
            )
        except ImportError:
            np.save(os.path.join(gt_dir, f"{i:03d}.npy"), arr)
    return data_dir, feats, gt_dir, n_cls


def _run_cli(arglist):
    """Run cli.main in-process, tee-ing stdout so JSON result lines (e.g.
    cmd_train_prior's final history row) can be parsed."""
    import contextlib
    import io

    from eeg_image_decode_tpu import cli

    buf = io.StringIO()

    class _Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return sys.__stdout__.write(s)

        def flush(self):
            sys.__stdout__.flush()

    with contextlib.redirect_stdout(_Tee()):
        cli.main(arglist)
    return buf.getvalue().splitlines()


def _last_json(lines):
    for line in reversed(lines):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {}


class Report:
    def __init__(self, work):
        self.path = os.path.join(work, "acceptance_report.json")
        self.stages = []
        self.ok = True

    def add(self, stage, status, **detail):
        row = {"stage": stage, "status": status, **detail}
        self.stages.append(row)
        if status == "fail":
            self.ok = False
        with open(self.path, "w") as f:
            json.dump({"ok": self.ok, "stages": self.stages}, f, indent=2)
        print(f"[{status.upper():5s}] {stage}: "
              f"{json.dumps(detail, default=str)[:300]}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data-path", help="preprocessed THINGS-EEG dir "
                                        "(sub-XX/preprocessed_eeg_*.npy)")
    ap.add_argument("--features", help="CLIP feature cache .npz")
    ap.add_argument("--subject", default="sub-01")
    ap.add_argument("--work-dir", default="./acceptance")
    ap.add_argument("--epochs-retrieval", type=int, default=40)
    ap.add_argument("--epochs-prior", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--seeds", type=int, default=10,
                    help="generated images per test class (ref: 10)")
    ap.add_argument("--generator-params", default=None,
                    help="converted SDXL+IP-Adapter pickle (gen/convert.py);"
                         " absent -> generation runs but is not scoreable")
    ap.add_argument("--text-encoder-params", default=None)
    ap.add_argument("--tokenizer-dir", default=None)
    ap.add_argument("--backbone-params", default=None,
                    help="metric backbones pickle (eval/backbones.py)")
    ap.add_argument("--clip-params", default=None,
                    help="flax CLIP ViT-L/14 vision params for the CLIP "
                         "metric row")
    ap.add_argument("--ground-truth", default=None,
                    help="test-class ground-truth image dir for stage 4")
    ap.add_argument("--dry-run", action="store_true",
                    help="tiny synthetic stand-ins, bands relaxed — "
                         "validates the runbook itself")
    args = ap.parse_args(argv)

    work = os.path.abspath(args.work_dir)
    os.makedirs(work, exist_ok=True)
    report = Report(work)

    if args.dry_run:
        data_path, features, gt_dir, n_test = _write_dry_run_tree(work)
        epochs_r, epochs_p, bs = 3, 10, 8
        eval_ks = "2,4,10"
        acc_key, band, hard = "top1_k10", (0.0, 1.01), -1.0
        prior_band, prior_hard = float("inf"), float("inf")
        seeds, tiny = 2, ["--tiny"]
        extra_train = ["--dtype", "float32"]
    else:
        if not (args.data_path and args.features):
            ap.error("--data-path and --features are required "
                     "(or use --dry-run)")
        data_path, features, gt_dir = (
            args.data_path, args.features, args.ground_truth,
        )
        n_test = 200
        epochs_r, epochs_p, bs = (
            args.epochs_retrieval, args.epochs_prior, args.batch_size,
        )
        eval_ks = "2,4,10,50,100,200"
        acc_key, band, hard = "top1_k200", (0.20, 0.40), 0.10
        prior_band, prior_hard = 0.18, 0.30
        seeds, tiny = args.seeds, []
        extra_train = []

    # ——— stage 1: retrieval training (ref ATMS_retrieval.py main) ———
    runs = os.path.join(work, "runs")
    exported = os.path.join(work, "eeg_features.npz")
    _run_cli([
        "train-retrieval", "--data-path", data_path,
        "--features", features, "--subjects", args.subject,
        "--epochs", str(epochs_r), "--batch-size", str(bs),
        "--eval-ks", eval_ks, "--output-dir", runs,
        "--export-features", exported, *extra_train,
    ])
    row = _final_row(_latest_results_csv(runs))
    acc = row.get(acc_key)
    if acc is None:
        # the evaluator silently skips any k > n_test_classes (subset runs,
        # THINGS-MEG's 200-vs-fewer) — fall back to the hardest k present
        # rather than crash, and say so in the report
        avail = sorted(
            (int(k.split("top1_k")[1]) for k in row if k.startswith("top1_k")),
            reverse=True,
        )
        if not avail:
            report.add("retrieval", "fail",
                       note=f"no top1_k* column in results.csv ({acc_key} "
                            "requested)", columns=sorted(row))
            print("OVERALL: FAIL")
            return 1
        acc_key = f"top1_k{avail[0]}"
        acc = row[acc_key]
    status = ("pass" if band[0] <= acc <= band[1]
              else ("fail" if acc < hard else "warn"))
    report.add(
        "retrieval", status,
        **{acc_key: acc, "expected_band": band,
           "reference": "~0.27-0.30 plateau (BASELINE.md / imgs/"
                        "test_acc.png)", "loss": row.get("loss")},
    )

    # ——— stage 2: diffusion prior (ref Generation_metrics_sub8 cell 8) ———
    prior_dir = os.path.join(work, "prior")
    lines = _run_cli([
        "train-prior", "--eeg-features", exported,
        "--epochs", str(epochs_p),
        "--batch-size", str(min(64 if args.dry_run else 1024,
                                int(np.load(exported)["eeg_features"]
                                    .shape[0]))),
        "--output-dir", prior_dir,
    ])
    prior_loss = _last_json(lines).get("loss")
    if prior_loss is None:
        ok = os.path.exists(os.path.join(prior_dir, "diffusion_prior.pkl"))
        report.add(
            "prior", "pass" if ok else "fail",
            note="trained pickle written; final loss line not parseable",
            expected=f"eps-MSE <= {prior_band} (ref ~0.142)",
        )
    else:
        status = ("pass" if prior_loss <= prior_band
                  else ("fail" if prior_loss > prior_hard else "warn"))
        report.add("prior", status, loss=prior_loss,
                   expected=f"<= {prior_band} (ref ~0.142)")

    # ——— stage 3: generation (ref cell 9: 200 classes x seeds) ———
    gen_dir = os.path.join(work, "generated")
    gen_args = [
        "generate", "--eeg-features", exported,
        "--prior-params", os.path.join(prior_dir, "diffusion_prior.pkl"),
        "--output-dir", gen_dir, "--seeds", str(seeds),
        "--sub", args.subject, *tiny,
    ]
    for flag, val in (
        ("--generator-params", args.generator_params),
        ("--text-encoder-params", args.text_encoder_params),
        ("--tokenizer-dir", args.tokenizer_dir),
    ):
        if val:
            gen_args += [flag, val]
    _run_cli(gen_args)
    pngs = glob.glob(os.path.join(gen_dir, "**", "*.png"), recursive=True)
    want = n_test * seeds
    scoreable = bool(args.generator_params) or args.dry_run
    report.add(
        "generate", "pass" if len(pngs) >= want else "fail",
        images=len(pngs), expected=want,
        note=None if scoreable else
        "random-init SDXL (no --generator-params): images exist but are "
        "not scoreable — supply converted weights for a real acceptance",
    )

    # ——— stage 4: reconstruction metrics (ref metric notebook) ———
    if gt_dir:
        table_csv = os.path.join(work, "metrics.csv")
        m_args = [
            "metrics", "--generated", os.path.join(gen_dir, args.subject),
            "--ground-truth", gt_dir, "--out", table_csv,
            "--image-size", "64" if args.dry_run else "425",
        ]
        if args.backbone_params:
            m_args += ["--backbone-params", args.backbone_params]
        if args.clip_params:
            m_args += ["--clip-params", args.clip_params]
        _run_cli(m_args)
        import csv as _csv

        with open(table_csv, newline="") as f:
            rows = list(_csv.DictReader(f))
        vals = {r["metric"]: float(r["value"]) for r in rows if r.get("value")}
        finite = all(np.isfinite(v) for v in vals.values())
        report.add(
            "metrics", "pass" if finite and vals else "fail",
            table=vals,
            note="reference commits no metric values (BASELINE.md row 8) — "
                 "rows reported, finiteness asserted",
        )
    else:
        report.add("metrics", "skip", note="no --ground-truth given")

    print(f"\nacceptance report: {report.path}")
    print("OVERALL:", "PASS" if report.ok else "FAIL")
    return 0 if report.ok else 1


if __name__ == "__main__":
    sys.exit(main())
