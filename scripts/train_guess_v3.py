"""Train the v3 transformer guess checkpoints (round-1 continuation).

Scales the v2 recipe (6 layers x embed 256, 600 epochs, FOV curriculum)
to 8 layers x embed 384, 1200 epochs.  Two models:

* calibration scenes (headline calibration metrics), FOV curriculum
* VO-window distribution (learned VO stitching)

Run: timeout 21000 python -u scripts/train_guess_v3.py calib
     timeout 21000 python -u scripts/train_guess_v3.py vo
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davo_tpu.train import fit, fit_fov_curriculum, get_preset

LAYERS = 8
EMBED = 384
HEADS = 8
EPOCHS = 1200


def log_fn(split, epoch, metrics):
    if epoch % 25 == 0 or split == "val":
        print(
            json.dumps(
                {
                    "split": split,
                    "epoch": epoch,
                    **{k: round(float(v), 5) for k, v in metrics.items()},
                }
            ),
            flush=True,
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "calib"
    cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        epochs=EPOCHS,
        hidden_size=EMBED,
        transformer_layers=LAYERS,
        transformer_heads=HEADS,
    )
    t0 = time.time()
    if which == "calib":
        state, history = fit_fov_curriculum(cfg, log_fn=log_fn)
        out = "artifacts/calibration_transformer_v3_1200.pkl"
    elif which == "vo":
        cfg = dataclasses.replace(cfg, data_source="vo_windows")
        state, history = fit(cfg, log_fn=log_fn)
        out = "artifacts/vo_windows_transformer_v3_1200.pkl"
    else:
        raise SystemExit(f"unknown target {which!r}")
    with open(out, "wb") as f:
        pickle.dump(
            {"params": state.params, "batch_stats": state.batch_stats}, f
        )
    print(
        json.dumps(
            {
                "saved": out,
                "minutes": round((time.time() - t0) / 60.0, 1),
                "final_val": history["val"][-1] if history["val"] else {},
            }
        )
    )


if __name__ == "__main__":
    main()
