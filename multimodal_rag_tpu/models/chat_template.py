"""First-party chat-template rendering for instruct checkpoints.

The reference folds chats into a hand-rolled ``system\\n\\nUser: ...``
frame (`/root/reference/app/models/llm_adapter.py:266-268`), which works
for its HTTP backends (Ollama applies the model's own template server-
side). Serving weights DIRECTLY on the chip means this framework must
apply the checkpoint's chat template itself, or instruct models see a
prompt format they were never trained on and answer in the wrong
register (or never emit their EOS).

The template ships next to the weights — ``chat_template.jinja`` in new
snapshots, or ``tokenizer_config.json``'s ``chat_template`` entry (a
string, or a list of ``{name, template}`` dicts). Rendering matches HF
``transformers.utils.chat_template_utils`` (golden-tested against its
``render_jinja_template``): an ImmutableSandboxedEnvironment with
trim/lstrip blocks, loop controls, the non-HTML-escaping ``tojson``
filter and the ``raise_exception``/``strftime_now`` globals, with the
checkpoint's bos/eos token strings in scope.
"""

from __future__ import annotations

import json
import logging
import os
from datetime import datetime
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


def _special_token_str(v) -> Optional[str]:
    """tokenizer_config special tokens are either strings or
    AddedToken-style ``{"content": ...}`` dicts."""
    if isinstance(v, str):
        return v
    if isinstance(v, dict):
        return v.get("content")
    return None


def load_chat_template(path: Optional[str]) -> Optional[Dict]:
    """Read the chat template (and bos/eos strings) shipped with a
    checkpoint directory. Returns ``{"template": str, "bos_token": str,
    "eos_token": str}`` or None when the snapshot has no template (base
    models) — callers then keep the plain completion framing."""
    if not path:
        return None
    base = path if os.path.isdir(path) else os.path.dirname(path)
    template = None
    jinja_path = os.path.join(base, "chat_template.jinja")
    if os.path.exists(jinja_path):
        try:
            with open(jinja_path, encoding="utf-8") as f:
                template = f.read()
        except OSError:
            return None
    cfg = {}
    try:
        with open(os.path.join(base, "tokenizer_config.json"),
                  encoding="utf-8") as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        cfg = {}
    if template is None:
        raw = cfg.get("chat_template")
        if isinstance(raw, str):
            template = raw
        elif isinstance(raw, list):  # named templates; HF picks "default"
            by_name = {
                d.get("name"): d.get("template")
                for d in raw if isinstance(d, dict)
            }
            template = by_name.get("default") or next(
                iter(by_name.values()), None
            )
    if not template:
        return None
    return {
        "template": template,
        "bos_token": _special_token_str(cfg.get("bos_token")) or "",
        "eos_token": _special_token_str(cfg.get("eos_token")) or "",
    }


_COMPILED: Dict[str, object] = {}


def _env():
    import jinja2
    from jinja2.sandbox import ImmutableSandboxedEnvironment

    def raise_exception(message):
        raise jinja2.exceptions.TemplateError(message)

    def tojson(x, ensure_ascii=False, indent=None, separators=None,
               sort_keys=False):
        # Jinja's built-in tojson escapes HTML; HF overrides it, so the
        # rendered prompt must match that override byte-for-byte.
        return json.dumps(x, ensure_ascii=ensure_ascii, indent=indent,
                          separators=separators, sort_keys=sort_keys)

    env = ImmutableSandboxedEnvironment(
        trim_blocks=True, lstrip_blocks=True,
        extensions=[jinja2.ext.loopcontrols],
    )
    env.filters["tojson"] = tojson
    env.globals["raise_exception"] = raise_exception
    env.globals["strftime_now"] = (
        lambda fmt: datetime.now().strftime(fmt)
    )
    return env


def template_accepts_tools(spec: Optional[Dict]) -> bool:
    """Whether the checkpoint's template consumes a ``tools`` variable
    (Hermes/Llama-3.1-style native tool calling). The API layer then
    skips its generic tool preamble — the template renders the format
    the weights were trained on."""
    return bool(spec) and "tools" in spec.get("template", "")


def render_chat(
    spec: Dict,
    messages: List[Dict],
    add_generation_prompt: bool = True,
    tools: Optional[List[Dict]] = None,
) -> str:
    """Render ``messages`` (OpenAI ``{"role", "content"}`` dicts, text
    content) through the checkpoint's template. Raises ValueError on
    template errors (e.g. a template's own ``raise_exception`` for an
    unsupported role) so the API layer can 400 instead of 500.
    ``tools`` (OpenAI function specs) ride into the template for
    checkpoints whose template renders them (HF passes the same list)."""
    import jinja2

    tpl = _COMPILED.get(spec["template"])
    if tpl is None:
        tpl = _env().from_string(spec["template"])
        _COMPILED[spec["template"]] = tpl
    try:
        return tpl.render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token=spec.get("bos_token", ""),
            eos_token=spec.get("eos_token", ""),
            tools=tools or None,
        )
    except jinja2.exceptions.TemplateError as e:
        raise ValueError(f"chat template rejected the conversation: {e}")
