"""LoRA adapter loading for the on-TPU decoder.

The reference pulled finetuned behavior by *naming a different Ollama
model* (`/root/reference/config.py:24-28`); serving weights directly
means this framework must load finetunes itself. PEFT publishes them as
LoRA adapters — `adapter_config.json` + `adapter_model.safetensors`
holding per-module low-rank pairs ``lora_A (r, in)`` / ``lora_B
(out, r)`` with effective delta ``(alpha / r) * B @ A``.

TPU-first choice: adapters are **merged into the stacked base weights at
load time** (W += scale * (B @ A)^T in this framework's (in, out)
layout). Decode is weight-streaming bound — a runtime ``x @ A @ B``
side-path would stream *extra* bytes every step and add two MXU-hostile
skinny matmuls, whereas the merged form serves at exactly base-model
cost; int8 quantization and tensor-parallel sharding then compose
unchanged (merge happens before both).

Set ``MMRAG_LLM_LORA_PATH`` (colon-separated for several adapters,
applied in order). Unsupported target modules (per-expert MoE weights)
are skipped with a loud warning, never silently half-applied.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "load_lora_adapter",
    "merge_lora",
    "find_lora_paths",
    "stack_lora_adapters",
]

#: PEFT target-module name -> (our stacked leaf, fused-split role).
#: Plain targets map 1:1; fused targets (Phi-3 qkv_proj / gate_up_proj)
#: split the B rows into their parts at cfg-derived offsets.
_PLAIN_TARGETS = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "w_gate",
    "up_proj": "w_up",
    "down_proj": "w_down",
}

_LAYER_RE = re.compile(
    r"\.layers\.(\d+)\.(?:self_attn|mlp)\.([A-Za-z_0-9]+)\."
    r"lora_(A|B)\.weight$"
)


def load_lora_adapter(path: str) -> Tuple[float, Dict]:
    """Read a PEFT LoRA directory. Returns ``(scale, modules)`` with
    ``modules[(layer_idx, hf_module)] = {"A": (r, in), "B": (out, r)}``
    as float32 numpy. Raises ``ValueError`` on malformed adapters."""
    base = path if os.path.isdir(path) else os.path.dirname(path)
    cfg_path = os.path.join(base, "adapter_config.json")
    try:
        with open(cfg_path, encoding="utf-8") as f:
            acfg = json.load(f)
    except (OSError, ValueError) as e:
        raise ValueError(f"unreadable adapter_config.json: {e}") from e
    if acfg.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(
            f"unsupported peft_type {acfg.get('peft_type')!r} (LoRA only)"
        )
    r = int(acfg.get("r", 0) or 0)
    if r <= 0:
        raise ValueError("adapter_config.json has no positive rank r")
    alpha = float(acfg.get("lora_alpha", r))
    scale = alpha / r
    if acfg.get("use_rslora"):
        scale = alpha / (r ** 0.5)
    weights_path = None
    for name in ("adapter_model.safetensors", "adapter_model.bin"):
        cand = os.path.join(base, name)
        if os.path.exists(cand):
            weights_path = cand
            break
    if weights_path is None:
        raise ValueError(f"no adapter_model.safetensors under {base}")
    if weights_path.endswith(".bin"):
        raise ValueError(
            "adapter_model.bin (torch pickle) is not supported; "
            "re-export the adapter as safetensors"
        )
    from safetensors import safe_open

    modules: Dict = {}
    with safe_open(weights_path, framework="numpy") as f:
        for key in f.keys():
            m = _LAYER_RE.search(key)
            if m is None:
                logger.warning(
                    "LoRA key %s targets an unsupported module; skipped",
                    key,
                )
                continue
            layer, module, ab = int(m.group(1)), m.group(2), m.group(3)
            slot = modules.setdefault((layer, module), {})
            slot[ab] = np.asarray(f.get_tensor(key), np.float32)
    for (layer, module), slot in modules.items():
        if "A" not in slot or "B" not in slot:
            raise ValueError(
                f"layer {layer} {module}: lora_A/lora_B pair incomplete"
            )
        if slot["A"].shape[0] != r or slot["B"].shape[1] != r:
            raise ValueError(
                f"layer {layer} {module}: rank mismatch vs config r={r}"
            )
    if not modules:
        raise ValueError("adapter holds no supported LoRA pairs")
    return scale, modules


def _fused_splits(cfg, module: str):
    """Row offsets of a fused projection's parts in its output dim."""
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    if module == "qkv_proj":
        return [("wq", 0, qd), ("wk", qd, qd + kvd),
                ("wv", qd + kvd, qd + 2 * kvd)]
    if module == "gate_up_proj":
        return [("w_gate", 0, cfg.ff_dim),
                ("w_up", cfg.ff_dim, 2 * cfg.ff_dim)]
    return None


def merge_lora(params: Dict, cfg, path: str) -> Dict:
    """Merge one LoRA adapter into the decoder's stacked params
    (float32 master copies; call BEFORE quantize/TP). Returns the params
    dict with updated ``layers`` leaves. MLA / MoE-expert targets are
    rejected loudly — a half-applied finetune is worse than an error."""
    if cfg.kv_lora_rank:
        raise ValueError(
            "LoRA merge for MLA-family (DeepSeek) checkpoints is not "
            "supported (projections are absorbed at load)"
        )
    scale, modules = load_lora_adapter(path)
    layers = dict(params["layers"])
    if any(k.endswith("_q") for k in layers):
        raise ValueError(
            "params are already int8-quantized; merge LoRA before "
            "quantization"
        )
    L = None
    for name in ("wq", "wk", "wv"):
        if name in layers:
            L = layers[name].shape[0]
            break
    if L is None:
        raise ValueError("params carry no attention projections to merge")
    applied = 0
    skipped = []
    # One float32 host materialization per touched leaf (not per pair);
    # merged stacks go back in the leaf's ORIGINAL dtype so bf16
    # checkpoints stay bf16.
    host: Dict[str, np.ndarray] = {}
    odtype: Dict[str, np.dtype] = {}
    for (layer, module), slot in sorted(modules.items()):
        if layer >= L:
            skipped.append(f"layer {layer} out of range")
            continue
        A, B = slot["A"], slot["B"]  # (r, in), (out, r)
        targets = []
        if module in _PLAIN_TARGETS:
            targets.append((_PLAIN_TARGETS[module], B))
        else:
            splits = _fused_splits(cfg, module)
            if splits is None:
                skipped.append(f"{module} (unsupported target)")
                continue
            for name, lo, hi in splits:
                targets.append((name, B[lo:hi]))
        for name, Bpart in targets:
            if name not in layers:
                skipped.append(f"{module} -> {name} (leaf absent)")
                continue
            if name not in host:
                odtype[name] = np.asarray(layers[name][:1]).dtype
                # np.array (copy): np.asarray of a jax array is a
                # read-only view — in-place merge needs a writable copy.
                host[name] = np.array(layers[name], np.float32)
            stack = host[name]
            delta = scale * (Bpart @ A).T  # (in, out) — our layout
            if delta.shape != stack.shape[1:]:
                raise ValueError(
                    f"layer {layer} {module}: delta shape {delta.shape} "
                    f"!= weight {stack.shape[1:]} — adapter does not "
                    "match this checkpoint"
                )
            stack[layer] = stack[layer] + delta
            applied += 1
    for name, stack in host.items():
        layers[name] = stack.astype(odtype[name])
    if skipped:
        logger.warning(
            "LoRA merge skipped %d target(s): %s",
            len(skipped), "; ".join(sorted(set(skipped))[:8]),
        )
    if applied == 0:
        raise ValueError(
            "LoRA adapter matched no weights in this checkpoint"
        )
    logger.info(
        "Merged LoRA adapter %s: %d module-layer deltas (scale %.3f)",
        path, applied, scale,
    )
    out = dict(params)
    out["layers"] = layers
    return out


def stack_lora_adapters(params: Dict, cfg, paths) -> Dict:
    """S-LoRA-style multi-adapter serving: attach N PEFT adapters as
    STACKED runtime side-paths instead of merging them.

    Where :func:`merge_lora` bakes ONE finetune into the base weights
    (every named finetune then costs a full weight copy), this keeps a
    single base copy and adds, per targeted weight ``name``, two scanned
    leaves ``slora_A_<name>`` (L, N+1, in, r_max) / ``slora_B_<name>``
    (L, N+1, r_max, out) — slot 0 is the all-zero BASE "adapter", slot j
    is adapter ``paths[j-1]`` (PEFT scale folded into B, ranks zero-
    padded to r_max; zero padding is exact since the delta is x@A@B).
    ``decoder._qmatmul`` gathers each batch row's pair by the per-row
    adapter id (the ``slora_ids`` leaf injected per dispatch by
    :func:`decoder.with_adapter_rows`), so N finetunes serve
    CONCURRENTLY from one base weight set — HBM grows by the adapters
    only, and the stack composes with int8 base weights (the side-path
    stays f32) and the continuous-batching server.

    Runtime cost: per targeted matmul, a (B, in, r)+(B, r, out) gather +
    two skinny f32 matmuls — O(B·r·(in+out)) extra HBM bytes per step,
    a few percent of the weight stream at r<=32. The reference has no
    counterpart (finetunes there are whole separate Ollama models,
    ``/root/reference/config.py:24-28``).
    """
    import jax.numpy as jnp

    if getattr(cfg, "kv_lora_rank", 0):
        raise ValueError(
            "adapter stacking for MLA-family (DeepSeek) checkpoints is "
            "not supported (projections are absorbed at load)"
        )
    if not paths:
        return params
    layers = dict(params["layers"])
    if any(k.startswith("slora_") for k in layers):
        raise ValueError("params already carry an adapter stack")

    def leaf_dims(name):
        w = layers.get(name)
        if w is None:
            w = layers.get(name + "_q")
        if w is None:
            w = params.get("layers_q4", {}).get(name + "_q4")
            if w is not None:  # packed nibbles: in dim is halved
                return (
                    int(w.shape[0]), int(w.shape[-2]) * 2,
                    int(w.shape[-1]),
                )
        if w is None or w.ndim == 4:
            # 4-D = per-expert MoE stacks: the expert einsum path does
            # not consult slora leaves, so stacking there would silently
            # no-op — skip loudly instead (same posture as merge_lora).
            return None
        return int(w.shape[0]), int(w.shape[-2]), int(w.shape[-1])

    loaded = [load_lora_adapter(p) for p in paths]
    n_ad = len(loaded)
    r_max = max(
        slot["A"].shape[0]
        for _s, modules in loaded
        for slot in modules.values()
    )

    # Union of targeted leaves across adapters (missing targets stay
    # all-zero for that adapter — an exact no-op).
    targets: Dict[str, tuple] = {}
    skipped = []
    for _scale, modules in loaded:
        for (_layer, module) in modules:
            names = (
                [_PLAIN_TARGETS[module]]
                if module in _PLAIN_TARGETS
                else [t[0] for t in (_fused_splits(cfg, module) or [])]
            )
            if not names:
                skipped.append(f"{module} (unsupported target)")
                continue
            for name in names:
                dims = leaf_dims(name)
                if dims is None:
                    skipped.append(f"{module} -> {name} (leaf absent)")
                    continue
                targets[name] = dims
    if not targets:
        raise ValueError(
            "no adapter matched any weight in this checkpoint: "
            + "; ".join(sorted(set(skipped))[:8])
        )

    A_host = {
        name: np.zeros((L, n_ad + 1, d_in, r_max), np.float32)
        for name, (L, d_in, _d_out) in targets.items()
    }
    B_host = {
        name: np.zeros((L, n_ad + 1, r_max, d_out), np.float32)
        for name, (L, _d_in, d_out) in targets.items()
    }
    applied = 0
    for j, (scale, modules) in enumerate(loaded, start=1):
        for (layer, module), slot in sorted(modules.items()):
            A, B = slot["A"], slot["B"]  # (r, in), (out, r)
            r = A.shape[0]
            if module in _PLAIN_TARGETS:
                parts = [(_PLAIN_TARGETS[module], B)]
            else:
                splits = _fused_splits(cfg, module)
                parts = (
                    [(name, B[lo:hi]) for name, lo, hi in splits]
                    if splits else []
                )
            for name, Bpart in parts:
                if name not in targets:
                    continue
                L, d_in, d_out = targets[name]
                if layer >= L:
                    skipped.append(f"layer {layer} out of range")
                    continue
                if A.shape[1] != d_in or Bpart.shape[0] != d_out:
                    raise ValueError(
                        f"adapter {paths[j - 1]} layer {layer} {module}: "
                        f"shapes A{A.shape} B{Bpart.shape} do not match "
                        f"weight ({d_in}, {d_out})"
                    )
                A_host[name][layer, j, :, :r] = A.T
                B_host[name][layer, j, :r, :] = scale * Bpart.T
                applied += 1
    if skipped:
        logger.warning(
            "adapter stack skipped %d target(s): %s",
            len(skipped), "; ".join(sorted(set(skipped))[:8]),
        )
    if applied == 0:
        raise ValueError("adapters matched no weights in this checkpoint")
    for name in targets:
        layers["slora_A_" + name] = jnp.asarray(A_host[name])
        layers["slora_B_" + name] = jnp.asarray(B_host[name])
    logger.info(
        "Stacked %d LoRA adapter(s): %d module-layer pairs over %s "
        "(r_max %d)", n_ad, applied, sorted(targets), r_max,
    )
    out = dict(params)
    out["layers"] = layers
    return out


def find_lora_paths() -> "list[str]":
    """``MMRAG_LLM_LORA_PATH`` (settings / env, .env honored) —
    colon-separated adapter dirs, merged in order (later adapters add on
    top of earlier ones). Configured-but-missing paths raise: silently
    serving the base model under a finetune's config would be a
    correctness lie."""
    try:
        from multimodal_rag_tpu.config import settings

        raw = settings.MMRAG_LLM_LORA_PATH
    except Exception:  # noqa: BLE001 — config import cycles in tools
        raw = os.environ.get("MMRAG_LLM_LORA_PATH", "")
    paths = [p for p in raw.split(":") if p.strip()]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise ValueError(
            f"MMRAG_LLM_LORA_PATH entries do not exist: {missing}"
        )
    return paths
