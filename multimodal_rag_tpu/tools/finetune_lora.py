"""LoRA finetuning CLI: corpus → trained PEFT adapter directory.

Closes the finetune loop the reference delegated to Ollama model names:
train low-rank adapters ON the serving chip (models/lora_train.py — the
frozen base streams exactly like a serving forward) and export a PEFT
directory that both this framework (``MMRAG_LLM_LORA_PATH`` /
``MMRAG_LLM_MODELS`` ``+lora`` suffixes) and HF PEFT can load.

Usage:
    python -m multimodal_rag_tpu.tools.finetune_lora DATA [DATA...]
        --out ./adapter [--checkpoint /path/to/snapshot]
        [--rank 8] [--alpha 16] [--lr 1e-4] [--epochs 1]
        [--seq-len 512] [--batch-size 8] [--targets wq,wk,wv,wo]

DATA: ``.txt``/``.md`` files or directories of them (one document per
file), or ``.jsonl`` with ``{"text": ...}`` rows (or
``{"prompt", "completion"}``, joined with a newline; the loss covers the
full sequence). Without ``--checkpoint`` the decoder falls back to the
configured/random base — useful only for smoke runs, and warned about.

Prints ONE JSON line: losses, tokens seen, steps, wall time, adapter path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import List


def load_texts(paths: List[str]) -> List[str]:
    texts: List[str] = []
    files: List[Path] = []
    for raw in paths:
        p = Path(raw)
        if p.is_dir():
            files.extend(sorted(
                f for f in p.rglob("*")
                if f.suffix.lower() in (".txt", ".md", ".jsonl")
            ))
        else:
            files.append(p)
    for f in files:
        if f.suffix.lower() == ".jsonl":
            for line in f.read_text(encoding="utf-8").splitlines():
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if "text" in row:
                    texts.append(str(row["text"]))
                elif "prompt" in row and "completion" in row:
                    texts.append(
                        f"{row['prompt']}\n{row['completion']}"
                    )
        else:
            body = f.read_text(encoding="utf-8", errors="replace").strip()
            if body:
                texts.append(body)
    return texts


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("data", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=None)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--targets", default=None,
                    help="comma-separated leaf names (default: all "
                         "attention+MLP projections)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from multimodal_rag_tpu.runtime.compile_cache import enable_compile_cache

    enable_compile_cache()

    texts = load_texts(args.data)
    if not texts:
        print(json.dumps({"error": "no training texts found"}))
        return 1

    import jax

    from multimodal_rag_tpu.models.decoder import TextDecoder
    from multimodal_rag_tpu.models.lora_train import (
        DEFAULT_TARGETS,
        batch_texts,
        init_lora_params,
        make_lora_optimizer,
        make_lora_train_step,
        save_peft_adapter,
    )

    dec = TextDecoder(checkpoint_path=args.checkpoint, lora_paths=[])
    if not dec.pretrained:
        print(
            "WARNING: training on RANDOM-INIT base weights — smoke runs "
            "only. Pass --checkpoint for a real finetune.",
            file=sys.stderr,
        )
    targets = (
        tuple(t.strip() for t in args.targets.split(",") if t.strip())
        if args.targets else DEFAULT_TARGETS
    )
    lora = init_lora_params(
        jax.random.key(args.seed), dec.params, r=args.rank,
        targets=targets,
    )
    opt = make_lora_optimizer(lr=args.lr)
    step = make_lora_train_step(dec.cfg, opt)
    state = opt.init(lora)
    batches = batch_texts(
        dec.tokenizer, texts, args.seq_len, args.batch_size
    )
    t0 = time.time()
    losses: List[float] = []
    tokens = 0
    for _epoch in range(args.epochs):
        for ids, mask in batches:
            lora, state, loss = step(dec.params, lora, state, ids, mask)
            losses.append(round(float(loss), 4))
            tokens += int(mask.sum())
    out = save_peft_adapter(
        lora, args.out, r=args.rank, alpha=args.alpha,
        base_model_name=args.checkpoint or "",
    )
    wall = time.time() - t0
    print(json.dumps({
        "adapter": out,
        "steps": len(losses),
        "epochs": args.epochs,
        "tokens": tokens,
        "tokens_per_sec": round(tokens / max(wall, 1e-9), 1),
        "first_loss": losses[0] if losses else None,
        "final_loss": losses[-1] if losses else None,
        "wall_s": round(wall, 2),
        "pretrained_base": dec.pretrained,
        "targets": list(targets),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
