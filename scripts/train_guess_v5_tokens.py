"""Train the v5 multi-token calibration guess (round-2 recipe change).

The v4 single-guess head plateaued at focal error 0.159 / ATE 0.216;
VERDICT round 1 names multi-token winner-take-all heads as the
recipe-level candidate: the head emits E diverse starts directly
(reference ``initial_guess/pinhole_camera_model_transformer_guess.py:
89-100``), trained so each element is scored by its BEST token.  Eval
uses the tokens as restart proposals (``restart_proposals="tokens"``).

Architecture matches v3 (8 layers x embed 384 — the v4 scale-up gave
little) with 8 readout tokens, 1200 epochs + FOV curriculum.

Run: timeout 10000 python -u scripts/train_guess_v5_tokens.py
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davo_tpu.train import fit_fov_curriculum, get_preset

LAYERS = 8
EMBED = 384
HEADS = 8
TOKENS = 8
EPOCHS = int(os.environ.get("V5_EPOCHS", "1200"))
OUT = "artifacts/calibration_transformer_v5_tokens8.pkl"


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
        guess_tokens=TOKENS,
    )
    t0 = time.time()
    state, history = fit_fov_curriculum(
        cfg, log_fn=log_fn, checkpoint_dir="artifacts/ckpt_v5_tokens_live"
    )
    with open(OUT, "wb") as f:
        pickle.dump(
            {"params": state.params, "batch_stats": state.batch_stats}, f
        )
    from davo_tpu.train import save_checkpoint

    save_checkpoint(
        "artifacts/ckpt_v5_tokens",
        EPOCHS,
        {"params": state.params, "batch_stats": state.batch_stats},
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
