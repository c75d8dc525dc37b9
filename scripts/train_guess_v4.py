"""Train the v4 calibration transformer guess (round-1 continuation).

Scales the v3 recipe (8 layers x embed 384, 1200 epochs, FOV curriculum)
to 10 layers x embed 448, 1800 epochs (~3 h on one v5e chip).

Run: timeout 12600 python -u scripts/train_guess_v4.py
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davo_tpu.train import fit_fov_curriculum, get_preset

LAYERS = 10
EMBED = 448
HEADS = 8
EPOCHS = 1800
OUT = "artifacts/calibration_transformer_v4_1800.pkl"


def log_fn(split, epoch, metrics):
    if epoch % 25 == 0 or (split == "val" and epoch % 5 == 0):
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
    cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        epochs=EPOCHS,
        hidden_size=EMBED,
        transformer_layers=LAYERS,
        transformer_heads=HEADS,
    )
    t0 = time.time()
    state, history = fit_fov_curriculum(cfg, log_fn=log_fn)
    with open(OUT, "wb") as f:
        pickle.dump(
            {"params": state.params, "batch_stats": state.batch_stats}, f
        )
    print(
        json.dumps(
            {
                "saved": OUT,
                "minutes": round((time.time() - t0) / 60.0, 1),
                "final_val": history["val"][-1] if history["val"] else {},
            }
        )
    )


if __name__ == "__main__":
    main()
