"""Train the v5 VO-window guess with observation-noise augmentation.

The round-2 noise study (scripts/vo_noise_study.py) measured the v3 guess
pipeline's raw stitched ATE tripling at sigma = 0.005 pixel noise — and
learned front-end matches carry sigma ~0.01-0.05 plus outliers.  This run
keeps the v3 architecture (8 x 384, the v4 scale-up was flat) and trains
on the VO-window distribution with pixel_noise = 0.02, so the guess head
sees the observation statistics the visual front-end actually produces.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 10000 python -u scripts/train_vo_v5_noise.py
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davo_tpu.train import fit, get_preset

OUT = "artifacts/vo_windows_transformer_v5_noise.pkl"
EPOCHS = int(os.environ.get("V5_EPOCHS", "1200"))


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
        hidden_size=384,
        transformer_layers=8,
        transformer_heads=8,
        data_source="vo_windows",
        pixel_noise=0.02,
    )
    t0 = time.time()
    state, history = fit(cfg, log_fn=log_fn)
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
