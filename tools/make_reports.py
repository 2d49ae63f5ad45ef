"""Generate PARITY.md and MODEL_ZOO.md from eval artifacts.

Inputs: PARITY.json (tools/parity_eval.py), runs/<scene>/eval.log
(scripts/evaluate_model.py output) and runs/<scene>/train.log.
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Published numbers for context (BASELINE.md)
REFERENCE_RECORDED = {
    "zara1": (0.42, 0.84),   # reference's own recorded run (GCN, best_k=1)
}
UPSTREAM_SGAN_20V20 = {
    "eth": (0.71, 1.29), "hotel": (0.48, 1.02), "univ": (0.56, 1.18),
    "zara1": (0.34, 0.69), "zara2": (0.31, 0.64),
}
# ADE8/FDE8 from the same reference MODEL_ZOO.md table (SGAN-20V-20)
UPSTREAM_SGAN_20V20_P8 = {
    "eth": (0.58, 1.13), "hotel": (0.36, 0.71), "univ": (0.33, 0.70),
    "zara1": (0.21, 0.42), "zara2": (0.21, 0.42),
}


def parse_eval_log(path):
    if not os.path.exists(path):
        return None
    txt = open(path).read()
    m = re.search(r"Dataset: (\S+), Pred Len: (\d+), ADE: ([\d.]+), "
                  r"FDE: ([\d.]+)", txt)
    if not m:
        return None
    return dict(dataset=m.group(1), pred_len=int(m.group(2)),
                ade=float(m.group(3)), fde=float(m.group(4)))


def parse_train_log(path):
    if not os.path.exists(path):
        return {}
    txt = open(path).read()
    out = {}
    m = re.findall(r"Training done in ([\d.]+)s", txt)
    if m:
        out["train_s"] = float(m[-1])
    m = re.findall(r"t = (\d+) / (\d+)", txt)
    if m:
        out["iterations"] = int(m[-1][1])
        # honest rate from total wall clock (in-loop window rates were
        # inflated before the host-readback sync fix)
        if out.get("train_s"):
            out["iters_per_sec"] = round(
                out["iterations"] / out["train_s"], 1)
    return out


def main():
    scenes = ["eth", "hotel", "univ", "zara1", "zara2"]
    best = {}
    best_path = os.path.join(ROOT, "runs", "BEST.json")
    if os.path.exists(best_path):
        best = json.load(open(best_path))
    rows = []
    for s in scenes:
        d = os.path.join(ROOT, best.get(s, os.path.join("runs", s)))
        ev = parse_eval_log(os.path.join(d, "eval.log"))
        tr = parse_train_log(os.path.join(d, "train.log"))
        rows.append((s, ev, tr))
    missing = [s for s, ev, _ in rows if ev is None]
    if missing:
        # Run artifacts (runs/<scene>/eval.log via runs/BEST.json) are not
        # checked in; without them a regeneration would replace curated
        # results with '(pending)'. Refuse rather than clobber — and skip
        # building the discarded zoo text, write PARITY.md only, then exit
        # non-zero so automation can detect the skip.
        print(f"MODEL_ZOO.md NOT regenerated: missing eval logs for "
              f"{missing} (runs/BEST.json -> runs/<dir>/eval.log). The "
              f"committed MODEL_ZOO.md is the curated record; only "
              f"regenerate with a full set of run artifacts.")
        write_parity()
        print("reports written (PARITY.md only)")
        sys.exit(1)

    zoo = ["# MODEL_ZOO — grouptraj models trained from scratch on TPU v5e",
           "",
           "Flagship group-GAT configuration (scripts/train.py defaults, "
           "200 epochs, best-of-20 variety loss), trained on ONE v5e chip "
           "and evaluated best-of-20 on the leave-one-out test split "
           "(`--use_best`). Upstream Social-GAN 20V-20 numbers from the "
           "reference MODEL_ZOO.md for context.",
           "",
           "| scene | ADE12 | FDE12 | upstream SGAN 20V-20 | iters | "
           "train time | iters/s |",
           "|---|---|---|---|---|---|---|"]
    for s, ev, tr in rows:
        if ev is None:
            zoo.append(f"| {s} | (pending) | | | | | |")
            continue
        up = UPSTREAM_SGAN_20V20.get(s, ("", ""))
        mark = " †" if s in ("univ", "zara2") else ""
        zoo.append(
            f"| {s}{mark} | **{ev['ade']:.2f}** | **{ev['fde']:.2f}** | "
            f"{up[0]} / {up[1]} | {tr.get('iterations','?')} | "
            f"{tr.get('train_s',0)/60:.1f} min | "
            f"{tr.get('iters_per_sec','?')} |")
    zoo += ["",
            "† univ's and zara2's shipped defaults are **gat-mh** "
            "(multi-head group GAT) models, promoted where the default "
            "config plateaus short of upstream (univ: 13-seed sweep "
            "plateaued at 0.62/1.24 — the reference's own univ ceiling; "
            "zara2: 12 seeds topped out at 0.32/0.66); full sweep tables "
            "in `models/grouptraj/PROVENANCE.json`. The best "
            "default-config runs ship alongside as "
            "`<scene>_12_gat_with_model.pt`."]
    # 8-step horizon zoo (reference ships *_8_model.pt families; upstream
    # publishes ADE8/FDE8). Rows come from runs/BEST8.json when curated,
    # else the best-ADE run among runs/p8_<scene>_s*/.
    best8 = {}
    best8_path = os.path.join(ROOT, "runs", "BEST8.json")
    if os.path.exists(best8_path):
        best8 = json.load(open(best8_path))
    p8rows = []
    for s in scenes:
        if s in best8:
            d = os.path.join(ROOT, best8[s])
            ev = parse_eval_log(os.path.join(d, "eval.log"))
            tr = parse_train_log(os.path.join(d, "train.log"))
        else:
            ev, tr = None, {}
            for d in sorted(glob.glob(os.path.join(ROOT, "runs",
                                                   f"p8_{s}_s*"))):
                e = parse_eval_log(os.path.join(d, "eval.log"))
                if e and (ev is None or e["ade"] < ev["ade"]):
                    ev = e
                    tr = parse_train_log(os.path.join(d, "train.log"))
        if ev:
            up = UPSTREAM_SGAN_20V20_P8[s]
            p8rows.append(
                f"| {s} | **{ev['ade']:.2f}** | **{ev['fde']:.2f}** | "
                f"{up[0]} / {up[1]} | {tr.get('train_s', 0)/60:.1f} min |")
    if p8rows:
        zoo += ["", "### 8-step horizon (`--pred_len 8`)", "",
                "Same flagship configuration trained for the reference's "
                "other published horizon (its `*_8_model.pt` families); "
                "checkpoints ship as `models/grouptraj/<scene>_8_with_"
                "model.pt`.", "",
                "| scene | ADE8 | FDE8 | upstream SGAN 20V-20 | train time |",
                "|---|---|---|---|---|"]
        zoo += p8rows
    # variant configurations
    variants = [
        ("gcn_zara1", "GCNPooling (train_GCN.py config: best_k=1, d_steps=2)"),
        ("gcn20_zara1", "GCNPooling + best-of-20 variety loss (impossible in "
                        "the reference)"),
        ("gatmh_univ_s6", "gat-mh (sgangat-g-p style: multi-head group GAT), "
                          "seed 6"),
        ("univ_s3", "default GAT config, best of 13 seeds (seed 3)"),
        ("univ400", "flagship GAT, 500 epochs"),
        ("gatmh_zara2_s3", "gat-mh, seed 3 (promoted default)"),
        ("zara2_s4", "default GAT config, best of 12 seeds (seed 4)"),
        # round-3 preset proof runs: the remaining reference training
        # configs (sgan / sgan-p / gcn module) trained end-to-end on real
        # data (reference families sgan-models / sgan-p-models /
        # sgan-g-p-models)
        ("preset_sgan_zara1", "sgan preset (no pooling, no graph module)"),
        ("preset_sganp_zara1", "sgan-p preset (pool_net, no graph module)"),
        ("preset_gcn_zara1", "gcn preset (GCNModule graph encoder)"),
    ]
    vrows = []
    for d, desc in variants:
        ev = parse_eval_log(os.path.join(ROOT, "runs", d, "eval.log"))
        if ev:
            vrows.append(f"| {ev['dataset']} | {desc} | {ev['ade']:.2f} | "
                         f"{ev['fde']:.2f} |")
    if vrows:
        zoo += ["", "### Variant configurations", "",
                "| scene | config | ADE12 | FDE12 |", "|---|---|---|---|"]
        zoo += vrows
        zoo += ["",
                "The gat-mh (multi-head group GAT) variant beats both the "
                "best default-config seed (0.62/1.24) and the reference's own "
                "univ checkpoint (0.62/1.28) on univ, matching upstream "
                "(0.56/1.18); it is the promoted univ default "
                "(`models/grouptraj/univ_12_with_model.pt`, also kept as "
                "`univ_12_gatmh_with_model.pt`). "
                "GCNPooling with the full best-of-20 variety loss — a "
                "combination the reference cannot train (its train_GCN.py "
                "crashes; its recorded GCN run used best_k=1) — reaches "
                "0.39/0.76 on zara1, beating the reference's recorded "
                "0.42/0.84; shipped as "
                "`models/grouptraj/zara1_12_gcnpool_with_model.pt`."]
    zoo += ["",
            "Reference's own recorded result (zara1, GCN pooling, best_k=1): "
            "ADE 0.42 / FDE 0.84 (`evaluate_model.py:129`).",
            "",
            "Checkpoints: `models/grouptraj/<scene>_12_with_model.pt` "
            "(loadable by scripts/evaluate_model.py and importable back "
            "into PyTorch via the torch-style state_dict inside)."]
    open(os.path.join(ROOT, "MODEL_ZOO.md"), "w").write("\n".join(zoo) + "\n")
    write_parity()
    print("reports written")


def write_parity():
    pj = os.path.join(ROOT, "PARITY.json")
    if os.path.exists(pj):
        results = json.load(open(pj))
        n = len(results)
        par = ["# PARITY — reference pretrained checkpoints through grouptraj",
               "",
               f"All {n} weight-bearing reference checkpoints ({n}/41 "
               "files; the 41st, the repo-root `checkpoint_no_model.pt`, "
               "stores optimizer/metric state with no model weights), "
               "imported by `grouptraj.compat` and evaluated best-of-20 on "
               "their test split by the TPU pipeline (the `raw` tracker-"
               "export model on its val split — that dataset ships no test "
               "split). Single-sample val ADEs recorded in the checkpoints "
               "themselves are ~1.1-1.3 m (BASELINE.md); best-of-20 numbers "
               "below are the deployable metric.",
               "",
               "| family | checkpoint | dataset | graph | pooling | ADE | "
               "FDE |",
               "|---|---|---|---|---|---|---|"]
        for r in results:
            if "error" in r:
                par.append(f"| {r.get('family','?')} | {r.get('file','?')} | "
                           f"- | - | - | ERROR: {r['error'][:60]} | |")
            else:
                par.append(
                    f"| {r['family']} | {r['file']} | {r['dataset']} | "
                    f"{r['graph_module']} | {r['pooling']} | {r['ade']:.2f} |"
                    f" {r['fde']:.2f} |")
        par += [
            "",
            "## GCNPooling (models/01): semantics recovered",
            "",
            "The lost GCNPooling class was recovered by checkpoint-fitness "
            "search (tools/gcnpool_lab.py): per-ped features = spatial "
            "embedding of the last relative displacement ‖ encoder hidden, "
            "both GCNs over the row-normalized intra-group adjacency "
            "(grouptraj/models/modules.py:gcn_pooling has the full evidence "
            "trail). models/01 now evaluates to 0.46/0.97 Bo20 (zara1) vs "
            "2.38/4.38 under the round-1 centroid-relative guess; the "
            "reference's recorded golden 0.42/0.84 is from a shorter sibling "
            "run of the same config (3628 iterations; the shipped checkpoint "
            "is a 451-epoch overtrain at t=5400), and the checkpoint's own "
            "val-ADE calibration (0.563 vs ~0.53 expected) confirms the "
            "recovered forward.",
            "",
            "## The sgangat-g-p anomaly (investigated, unresolved upstream)",
            "",
            "The sgangat-g-p rows are worse than every other family and do "
            "not beat the checkpoints' own single-sample val ADE. This is a "
            "property of the LOST era-(b) training code, not of our import "
            "(evidence in ARCHITECTURE.md 'gat-mh era'): every shared "
            "component is verified by the other families (sgan-g-p imports "
            "to 0.58 single-sample val ADE through the identical "
            "encoder/pool/decoder path); our batch-GAT math is torch-oracle "
            "verified against the reference's surviving commented code "
            "(tests/test_compat.py::test_batch_gat_matches_torch_oracle); "
            "and a 25+-variant semantic sweep over every surviving-code "
            "ambiguity (tools/gatmh_probe.py, tools/gatmh_lab.py: adjacency "
            "mix/mask/none, head-concat view/transpose, InstanceNorm on/off, "
            "velocity inputs, residuals, post-activations) lands every "
            "variant at 1.68-2.28 val ADE vs the ~0.59 a correct import "
            "scores, with the gatencoder-bypassed control strictly worse "
            "(2.03 Bo20) — the era's forward used the gatencoder but in a "
            "form no surviving code expresses.",
        ]
        open(os.path.join(ROOT, "PARITY.md"), "w").write("\n".join(par) + "\n")


if __name__ == "__main__":
    main()
