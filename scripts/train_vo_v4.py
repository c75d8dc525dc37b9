"""Train the v4 VO-window guess (10 layers x embed 448, 1200 epochs).

Run: timeout 10000 python -u scripts/train_vo_v4.py
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davo_tpu.train import fit, get_preset

OUT = "artifacts/vo_windows_transformer_v4_1200.pkl"


def log_fn(split, epoch, metrics):
    if epoch % 25 == 0 or (split == "val" and epoch % 5 == 0):
        print(json.dumps({"split": split, "epoch": epoch,
                          **{k: round(float(v), 5) for k, v in metrics.items()}}),
              flush=True)


def main():
    cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        epochs=1200,
        hidden_size=448,
        transformer_layers=10,
        transformer_heads=8,
        data_source="vo_windows",
    )
    t0 = time.time()
    state, history = fit(cfg, log_fn=log_fn)
    with open(OUT, "wb") as f:
        pickle.dump({"params": state.params, "batch_stats": state.batch_stats}, f)
    print(json.dumps({"saved": OUT, "minutes": round((time.time() - t0) / 60.0, 1),
                      "final_val": history["val"][-1] if history["val"] else {}}))


if __name__ == "__main__":
    main()
