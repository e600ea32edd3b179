"""OpenAI tool calling (``tools`` / ``tool_choice``) for the chat surface.

The reference only *consumed* the OpenAI chat contract
(`/root/reference/app/models/llm_adapter.py:169-223`); serving it means
implementing the function-calling half: validating tool specs, rendering
them into the prompt (natively through the checkpoint's chat template
when it consumes a ``tools`` variable, via a generic JSON-convention
preamble otherwise), FORCING the call shape with the grammar engine when
``tool_choice`` is ``required``/named (models/grammar.py — the arguments
object is constrained by the tool's own ``parameters`` JSON Schema), and
parsing emitted calls back into OpenAI ``message.tool_calls``.

Canonical emission shape (what the preamble instructs and the grammar
enforces): ``{"name": <tool>, "arguments": {...}}`` — name first, so a
streamed call reveals its target before its arguments."""

from __future__ import annotations

import json
import re
import uuid
from typing import Dict, List, Optional, Tuple

__all__ = [
    "validate_tools",
    "tools_preamble",
    "toolcall_grammar_spec",
    "extract_tool_call",
    "make_tool_call_id",
    "normalize_tool_messages",
    "fold_tool_message",
]


def validate_tools(body: dict) -> "Tuple[Optional[list], object, Optional[str]]":
    """Parse ``tools``/``tool_choice`` from an OpenAI chat body.

    Returns ``(tools, tool_choice, error)``: ``tools`` is the normalized
    function-spec list (None when absent), ``tool_choice`` one of
    ``"auto" | "none" | "required" | ("name", <tool name>)``."""
    raw = body.get("tools")
    if raw is None:
        if body.get("tool_choice") not in (None, "none", "auto"):
            return None, None, "tool_choice requires tools"
        return None, None, None
    if not isinstance(raw, list) or not raw:
        return None, None, "tools must be a non-empty list"
    if len(raw) > 64:
        return None, None, "at most 64 tools are supported"
    tools = []
    names = set()
    for i, t in enumerate(raw):
        if not isinstance(t, dict) or t.get("type") != "function":
            return None, None, (
                f"tools[{i}] must be an object with type 'function'"
            )
        fn = t.get("function")
        if not isinstance(fn, dict):
            return None, None, f"tools[{i}].function must be an object"
        name = fn.get("name")
        if not isinstance(name, str) or not re.fullmatch(
            r"[A-Za-z0-9_.-]{1,64}", name
        ):
            return None, None, (
                f"tools[{i}].function.name must match "
                "[A-Za-z0-9_.-]{{1,64}}"
            )
        if name in names:
            return None, None, f"duplicate tool name {name!r}"
        names.add(name)
        params = fn.get("parameters")
        if params is not None and not isinstance(params, dict):
            return None, None, (
                f"tools[{i}].function.parameters must be an object"
            )
        tools.append({
            "type": "function",
            "function": {
                "name": name,
                "description": str(fn.get("description") or ""),
                "parameters": params or {"type": "object"},
            },
        })
    choice = body.get("tool_choice", "auto")
    if choice in (None, "auto"):
        choice = "auto"
    elif choice in ("none", "required"):
        pass
    elif isinstance(choice, dict):
        fn = choice.get("function") or {}
        name = fn.get("name") if isinstance(fn, dict) else None
        if choice.get("type") != "function" or name not in names:
            return None, None, (
                "tool_choice object must name one of the provided tools"
            )
        choice = ("name", name)
    else:
        return None, None, (
            "tool_choice must be 'auto', 'none', 'required', or a "
            "function object"
        )
    return tools, choice, None


def tools_preamble(tools: List[Dict]) -> str:
    """Generic tool prompt for checkpoints whose chat template does not
    render tools natively (and for the plain-fold path)."""
    specs = json.dumps(
        [t["function"] for t in tools], ensure_ascii=False, indent=2
    )
    return (
        "You have access to the following tools:\n"
        f"{specs}\n"
        "To call a tool, respond with ONLY a JSON object of the form "
        '{"name": <tool name>, "arguments": <arguments object>} and no '
        "other text. If no tool is needed, answer normally."
    )


def _tool_call_schema(tool: Dict) -> Dict:
    """Per-tool call-envelope schema; the arguments object is the tool's
    own ``parameters`` schema when the grammar compiler supports it,
    a free-form JSON object otherwise (never a silent reject)."""
    from multimodal_rag_tpu.models.grammar import schema_to_grammar

    params = tool["function"].get("parameters") or {"type": "object"}
    try:
        schema_to_grammar(params)
    except ValueError:
        params = {"type": "object"}
    return {
        "type": "object",
        "properties": {
            "name": {"const": tool["function"]["name"]},
            "arguments": params,
        },
        "required": ["name", "arguments"],
    }


def toolcall_grammar_spec(
    tools: List[Dict], forced_name: Optional[str] = None
) -> tuple:
    """Grammar spec (for ``grammar.masker_for``) forcing a tool-call
    envelope: the named tool only, or anyOf over all tools."""
    cands = [
        t for t in tools
        if forced_name is None or t["function"]["name"] == forced_name
    ]
    schemas = [_tool_call_schema(t) for t in cands]
    schema = schemas[0] if len(schemas) == 1 else {"anyOf": schemas}
    # No key sorting: the grammar enforces property ORDER ("name" first,
    # so a streamed call reveals its target before its arguments).
    return ("schema", json.dumps(schema))


def extract_tool_call(
    text: str, names: "set[str]"
) -> "Optional[Tuple[str, str]]":
    """Find a tool-call JSON object in generated text. Grammar-forced
    outputs ARE the object; auto-mode outputs may wrap it (prose,
    ``<tool_call>`` tags from native templates) — scan balanced-JSON
    candidates from each '{'. Returns ``(name, arguments_json)`` or
    None."""
    dec = json.JSONDecoder()
    for m in re.finditer(r"\{", text):
        try:
            obj, _end = dec.raw_decode(text, m.start())
        except ValueError:
            continue
        if not isinstance(obj, dict):
            continue
        name = obj.get("name")
        if name not in names:
            continue
        args = obj.get("arguments", obj.get("parameters"))
        if args is None:
            args = {}
        if isinstance(args, str):
            # Some models double-encode; accept a JSON-string payload.
            try:
                args = json.loads(args)
            except ValueError:
                pass
        return name, json.dumps(args, ensure_ascii=False)
    return None


def make_tool_call_id() -> str:
    return f"call_{uuid.uuid4().hex[:24]}"


def normalize_tool_messages(messages: List[Dict],
                            texts: Dict[int, str]) -> List[Dict]:
    """OpenAI wire messages → the template-facing message list: content
    replaced by the folded text, assistant ``tool_calls`` arguments
    json-decoded into dicts (the HF template convention — transformers
    passes parsed arguments), tool-role fields preserved."""
    out = []
    for i, m in enumerate(messages):
        role = m.get("role", "user")
        entry: Dict = {"role": role, "content": texts.get(i, "") or ""}
        if role == "assistant" and isinstance(m.get("tool_calls"), list):
            calls = []
            for c in m["tool_calls"]:
                if not isinstance(c, dict):
                    continue
                fn = c.get("function") or {}
                args = fn.get("arguments")
                if isinstance(args, str):
                    try:
                        args = json.loads(args)
                    except ValueError:
                        pass
                calls.append({
                    "id": c.get("id") or make_tool_call_id(),
                    "type": "function",
                    "function": {
                        "name": fn.get("name", ""),
                        "arguments": args if args is not None else {},
                    },
                })
            entry["tool_calls"] = calls
        if role == "tool":
            if m.get("tool_call_id"):
                entry["tool_call_id"] = m["tool_call_id"]
            if m.get("name"):
                entry["name"] = m["name"]
        out.append(entry)
    return out


def fold_tool_message(m: Dict, text: str) -> str:
    """Plain-fold rendering (no chat template) of tool-flavored
    messages, mirroring the existing ``role: content`` frame."""
    role = m.get("role", "user")
    if role == "assistant" and isinstance(m.get("tool_calls"), list):
        calls = []
        for c in m["tool_calls"]:
            fn = (c or {}).get("function") or {}
            args = fn.get("arguments")
            if not isinstance(args, str):
                args = json.dumps(args, ensure_ascii=False)
            calls.append(f"{fn.get('name', '?')}({args})")
        suffix = f" [called: {', '.join(calls)}]" if calls else ""
        return f"assistant: {text}{suffix}"
    if role == "tool":
        tid = m.get("tool_call_id") or m.get("name") or "tool"
        return f"tool ({tid}): {text}"
    return f"{role}: {text}"
