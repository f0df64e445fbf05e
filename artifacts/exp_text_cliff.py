"""Round-3 experiment: break the full-size from-scratch text cliff.

docs/TRAINING.md documents that a from-scratch 12x3072 post-LN BERT on
the 550-sample text task is pinned at loss = ln(10) regardless of LR,
clipping, init, or dtype. VERDICT r2 #8 asks for one experiment: LR
warmup (already supported: training.warmup_epochs) and/or a flag-gated
pre-LN variant (text_encoder.pre_layernorm, added this round).

Runs the SAME full-size recipe with post-LN (control) and pre-LN and
writes loss histories to artifacts/round4/text_cliff.json.

Round-3 postmortem: the original version buffered everything and wrote
the JSON only after BOTH 30-epoch runs — the chip session ended mid-run
and nothing survived (VERDICT r3 missing #1). Now each variant persists
as it completes and reruns skip finished variants.

Run on the real chip: python artifacts/exp_text_cliff.py [epochs]
"""

import json
import logging
import sys
import time
from pathlib import Path

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.train import Trainer
from multimodal_rare_disease_tpu.train.pipeline import DataPipeline

# per-epoch trainer lines to stdout — the silent 70-minute round-3/4
# runs were undebuggable without them
logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                    format="%(asctime)s %(message)s")

OUT = Path(__file__).parent / "round4"
OUT.mkdir(exist_ok=True)

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def run(pre_ln: bool, workdir: str):
    cfg = resolve_config("default", {
        # full BERT-base geometry — the documented cliff configuration
        "text_encoder.num_layers": 12,
        "text_encoder.hidden_size": 768,
        "text_encoder.num_heads": 12,
        "text_encoder.intermediate_size": 3072,
        "text_encoder.pre_layernorm": pre_ln,
        "data.max_text_length": 128,
        "data.augmentation_factor": 4,
        "training.batch_size": 32,
        "training.num_epochs": EPOCHS,
        "training.learning_rate": 3e-4,
        "training.scheduler": "cosine",
        "training.warmup_epochs": 3,
        "training.early_stopping": False,
        "training.checkpoint_dir": workdir,
        # loss curves are the deliverable; a full-size best-save reads
        # ~GBs back over the tunnel per improving epoch and dominated
        # wall-clock in the first round-4 attempt
        "training.save_checkpoints": False,
    })
    pipe = DataPipeline(cfg, mode="text_only",
                        image_dir="/root/reference/data/images")
    tr = Trainer(cfg, mode="text_only", pipeline=pipe, workdir=workdir)
    t0 = time.time()
    res = tr.train(num_epochs=EPOCHS)
    h = res["history"]
    return {
        "pre_layernorm": pre_ln,
        "epochs": EPOCHS,
        "train_loss": [round(float(x), 4) for x in h["train_loss"]],
        "val_loss": [round(float(x), 4) for x in h["val_loss"]],
        "train_acc": [round(float(x), 4) for x in h["train_acc"]],
        "val_acc": [round(float(x), 4) for x in h["val_acc"]],
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    out = OUT / "text_cliff.json"
    results = json.loads(out.read_text()) if out.exists() else {}
    for pre_ln in (False, True):
        tag = "pre_ln" if pre_ln else "post_ln"
        if tag in results:
            print(f"{tag}: cached", flush=True)
            continue
        print(f"=== {tag} (full-size 12x3072, warmup 3 epochs) ===",
              flush=True)
        r = run(pre_ln, f"/tmp/text_cliff_{tag}")
        results[tag] = r
        out.write_text(json.dumps(results, indent=1))
        print(f"{tag}: final train_loss={r['train_loss'][-1]} "
              f"val_acc={r['val_acc'][-1]}", flush=True)
    print("written", out)


if __name__ == "__main__":
    main()
