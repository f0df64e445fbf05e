"""Text-cliff mechanism hunt, part 2: learning-rate sweep.

Round-4 result (text_cliff.json): at lr=3e-4, BOTH post-LN and pre-LN
full-size (12x3072) stacks sit at the uniform-logits attractor after 30
epochs — LN placement and warmup alone don't break the cliff. The
remaining obvious suspect is the LR itself: 3e-4 is a pre-training-scale
rate; transformer fine-tuning uses 1e-5..5e-5, and an overparameterized
model on 2.2k samples at high LR can jump straight to the saddle.

Sweep {1e-4, 3e-5, 1e-5} x {post_ln, pre_ln}, 30 epochs, no checkpoint
IO. Writes artifacts/round4/text_cliff_lr.json incrementally.

Run on chip: python artifacts/exp_text_cliff_lr.py [epochs]
"""

import json
import logging
import sys
import time
from pathlib import Path

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.train import Trainer
from multimodal_rare_disease_tpu.train.pipeline import DataPipeline

logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                    format="%(asctime)s %(message)s")

OUT = Path(__file__).parent / "round4"
OUT.mkdir(exist_ok=True)
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def run(pre_ln: bool, lr: float):
    cfg = resolve_config("default", {
        "text_encoder.num_layers": 12,
        "text_encoder.hidden_size": 768,
        "text_encoder.num_heads": 12,
        "text_encoder.intermediate_size": 3072,
        "text_encoder.pre_layernorm": pre_ln,
        "data.max_text_length": 128,
        "data.augmentation_factor": 4,
        "training.batch_size": 32,
        "training.num_epochs": EPOCHS,
        "training.learning_rate": lr,
        "training.scheduler": "cosine",
        "training.warmup_epochs": 3,
        "training.early_stopping": False,
        "training.save_checkpoints": False,
        "training.checkpoint_dir": "/tmp/text_cliff_lr",
    })
    pipe = DataPipeline(cfg, mode="text_only",
                        image_dir="/root/reference/data/images")
    tr = Trainer(cfg, mode="text_only", pipeline=pipe,
                 workdir="/tmp/text_cliff_lr")
    t0 = time.time()
    res = tr.train(num_epochs=EPOCHS)
    h = res["history"]
    return {
        "pre_layernorm": pre_ln, "lr": lr, "epochs": EPOCHS,
        "train_loss": [round(float(x), 4) for x in h["train_loss"]],
        "val_loss": [round(float(x), 4) for x in h["val_loss"]],
        "train_acc": [round(float(x), 4) for x in h["train_acc"]],
        "val_acc": [round(float(x), 4) for x in h["val_acc"]],
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    out = OUT / "text_cliff_lr.json"
    results = json.loads(out.read_text()) if out.exists() else {}
    lrs = ((1e-4, 3e-5, 1e-5) if EPOCHS <= 30 else (1e-5, 3e-6))
    for lr in lrs:
        for pre_ln in (False, True):
            tag = f"{'pre' if pre_ln else 'post'}_ln_lr{lr:g}"
            if EPOCHS != 30:
                tag += f"_e{EPOCHS}"
            if tag in results:
                print(f"{tag}: cached", flush=True)
                continue
            print(f"=== {tag} ===", flush=True)
            r = run(pre_ln, lr)
            results[tag] = r
            out.write_text(json.dumps(results, indent=1))
            print(f"{tag}: final train_loss={r['train_loss'][-1]} "
                  f"train_acc={r['train_acc'][-1]} "
                  f"val_acc={r['val_acc'][-1]}", flush=True)
    print("written", out)


if __name__ == "__main__":
    main()
