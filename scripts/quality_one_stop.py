"""Full-fidelity ONE-STOP quality run through the product path: menu
'seven' with --classify (runner_production_chain(classify=True)) on real
TPU — trains the full-frame lung U-Net, the task1 infection U-Net, AND the
task2 classifier, then serves production.one_stop_infer on the held-out
case with no ground truth: lung seg + infection seg + per-slice infection
probability in one jit.

This is the runner-level counterpart of scripts/profile_one_stop.py (which
measures cost/quality on frozen round-2 checkpoints): everything here —
checkpoints, figures, sweep reports, the chain gallery, the classification
metrics — is emitted by the runner itself, like a user would get.

Writes artifacts_tpu/r3_one_stop/ + round3_one_stop_runner.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _timing  # noqa: F401,E402  (compile-cache env + repo path)

KW = dict(n_synthetic=16, synth_hw=512, synth_slices=40, seed=7)


def main():
    from onestop_tpu.runners import runner_production_chain

    t0 = time.time()
    res = runner_production_chain(
        out_dir="artifacts_tpu/r3_one_stop", classify=True,
        cache_dir="artifacts_tpu/cache_r2", **KW)
    out = {k: res[k] for k in (
        "dice_chained", "dice_gt_boxes", "dice_delta", "lung_val_dice",
        "infection_val_dice", "cls_accuracy_at_0.5", "cls_n_positive",
        "cls_val_auc") if k in res}
    if "cls_auc" in res:
        out["cls_auc"] = res["cls_auc"]
    out["train_plus_eval_seconds"] = time.time() - t0
    print(json.dumps(out), flush=True)
    with open("artifacts_tpu/round3_one_stop_runner.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts_tpu/round3_one_stop_runner.json")


if __name__ == "__main__":
    main()
