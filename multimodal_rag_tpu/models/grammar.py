"""Grammar-constrained decoding: byte-level grammars -> per-step vocab masks.

OpenAI ``response_format`` (``json_object`` / ``json_schema``) and
grammar-forced tool calls need the sampler to only ever pick tokens that
keep the output inside a formal language. The reference delegated this to
its HTTP backends (OpenAI served it server-side; Ollama via ``format:
json`` — reference ``app/models/llm_adapter.py:142-155`` shows the raw
generate contract); a framework that *serves* the OpenAI surface on-chip
(``serving_decode.DecodeServer``) must enforce it in its own sampler.

TPU-first shape of the problem: the compiled decode step cannot run a
parser, and per-step recompilation is forbidden — so the grammar runs on
the HOST as a pushdown automaton over bytes, and what crosses to the
device is a packed (B, ceil(V/8)) uint8 bitmask per step (16 KB/row at a
128k vocab — noise next to weight streaming). The device side is one
``jnp.where(allowed, logits, -1e9)`` folded into the existing sampler
executables (a STATIC ``want_mask`` flag, so unconstrained serving
compiles exactly as before).

Three layers:

* **Grammar** — a recursive transition network (RTN): nodes with
  byte-class edges, epsilon *call* edges (push a return node), and
  *accept* flags (pop). Recursion (JSON values containing values) is the
  natural case; JSON-Schema ``$ref`` recursion falls out for free.
* **GrammarMachine** — nondeterministic simulation over interned
  closure'd config sets ``{(node, stack)}``; ``step(state, byte)`` and
  ``accepts_end(state)`` are memoized, so repeated states (every byte of
  string content maps back to the same state) cost a dict hit.
* **TokenMasker** — a byte trie over the tokenizer's per-token byte
  strings, walked once per NOVEL machine state with the step memo; a
  token is allowed iff consuming all its bytes keeps >= 1 parse config
  alive. Masks are cached per state — a typical JSON generation touches
  a few dozen distinct states, so steady-state cost is a dict lookup.

EOS is allowed exactly when the document can end (all parse configs can
pop to completion); the root grammar carries no trailing-whitespace loop,
so a closed root object leaves EOS as the only unmasked token and
generation terminates cleanly.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "Grammar",
    "GrammarMachine",
    "TokenMasker",
    "json_grammar",
    "schema_to_grammar",
    "token_byte_table",
    "masker_for",
]


# --------------------------------------------------------------------------
# Byte-class masks (256-bit ints; bit b set => byte b allowed)
# --------------------------------------------------------------------------

def _bm(chars: bytes) -> int:
    m = 0
    for b in chars:
        m |= 1 << b
    return m


def _bm_range(lo: int, hi: int) -> int:
    """Inclusive byte range [lo, hi]."""
    return ((1 << (hi - lo + 1)) - 1) << lo


_WS = _bm(b" \t\n\r")
_DIGIT = _bm(b"0123456789")
_DIGIT19 = _bm(b"123456789")
_HEX = _bm(b"0123456789abcdefABCDEF")
# JSON string content: any byte except '"', '\\' and control chars
# (< 0x20). Bytes >= 0x80 pass raw — tokens carry UTF-8 fragments that
# concatenate into valid text (byte-level BPE splits code points across
# tokens; validating UTF-8 mid-sequence would reject legal continuations).
_STR_PLAIN = (
    _bm_range(0x20, 0xFF) & ~_bm(b'"\\')
)
_ESCAPABLE = _bm(b'"\\/bfnrt')


# --------------------------------------------------------------------------
# Grammar IR
# --------------------------------------------------------------------------

@dataclass
class _Node:
    # (byte bitmask, target node) consuming edges
    edges: List[Tuple[int, int]] = field(default_factory=list)
    # (subgraph entry, return node) epsilon call edges (push `return`)
    calls: List[Tuple[int, int]] = field(default_factory=list)
    # may pop to the caller's return node (epsilon)
    accept: bool = False


@dataclass
class Grammar:
    nodes: List[_Node]
    entry: int


class _Builder:
    """Tiny DSL for assembling RTN grammars. Fragments follow one
    convention: a single entry node, terminating node(s) marked
    ``accept`` (pop to the caller's return node)."""

    def __init__(self) -> None:
        self.nodes: List[_Node] = []
        self._json_value: Optional[int] = None
        self._json_object: Optional[int] = None
        self._generic: Dict[str, int] = {}

    def node(self, accept: bool = False) -> int:
        self.nodes.append(_Node(accept=accept))
        return len(self.nodes) - 1

    def edge(self, src: int, mask: int, dst: int) -> None:
        self.nodes[src].edges.append((mask, dst))

    def call(self, src: int, entry: int, ret: int) -> None:
        self.nodes[src].calls.append((entry, ret))

    def chain(self, src: int, data: bytes, dst: int) -> None:
        """Literal byte chain src --data--> dst."""
        cur = src
        for i, b in enumerate(data):
            nxt = dst if i == len(data) - 1 else self.node()
            self.edge(cur, 1 << b, nxt)
            cur = nxt
        if not data:
            raise ValueError("empty literal chain")

    # -- generic JSON fragments (built once per builder, on demand) -------

    def _frag(self, name: str, build) -> int:
        if name not in self._generic:
            # Pre-register the entry so recursive builds (value -> object
            # -> value) resolve to the same fragment.
            entry = self.node()
            self._generic[name] = entry
            build(entry)
        return self._generic[name]

    #: Max consecutive whitespace bytes between JSON tokens. BOUNDED on
    #: purpose: a ws self-loop would let a whitespace-loving model (or a
    #: +100 logit_bias on '\n') babble legally forever without emitting
    #: structure — the same cap llguidance-class engines apply.
    WS_RUN = 12

    def ws_frag(self) -> int:
        """0..WS_RUN whitespace bytes, as a callable fragment (entry is
        accepting, so the zero-length match pops immediately)."""
        def build(entry: int) -> None:
            self.nodes[entry].accept = True
            cur = entry
            for _ in range(self.WS_RUN):
                nxt = self.node(accept=True)
                self.edge(cur, _WS, nxt)
                cur = nxt
        return self._frag("ws", build)

    def ws_then(self, target: int) -> int:
        """A node that skips bounded whitespace, then continues at
        ``target`` (replaces the unbounded ws self-loop pattern)."""
        x = self.node()
        self.call(x, self.ws_frag(), target)
        return x

    def string_frag(self) -> int:
        def build(entry: int) -> None:
            inside = self.node()
            esc = self.node()
            h1, h2, h3 = self.node(), self.node(), self.node()
            end = self.node(accept=True)
            self.edge(entry, _bm(b'"'), inside)
            self.edge(inside, _STR_PLAIN, inside)
            self.edge(inside, _bm(b"\\"), esc)
            self.edge(esc, _ESCAPABLE, inside)
            self.edge(esc, _bm(b"u"), h1)
            self.edge(h1, _HEX, h2)
            self.edge(h2, _HEX, h3)
            h4 = self.node()
            self.edge(h3, _HEX, h4)
            self.edge(h4, _HEX, inside)
            self.edge(inside, _bm(b'"'), end)
        return self._frag("string", build)

    def number_frag(self, integer: bool = False) -> int:
        name = "integer" if integer else "number"

        def build(entry: int) -> None:
            sign = self.node()
            zero = self.node(accept=True)
            digits = self.node(accept=True)
            self.edge(entry, _bm(b"-"), sign)
            for s in (entry, sign):
                self.edge(s, _bm(b"0"), zero)
                self.edge(s, _DIGIT19, digits)
            self.edge(digits, _DIGIT, digits)
            if not integer:
                dot = self.node()
                frac = self.node(accept=True)
                e0 = self.node()
                es = self.node()
                exp = self.node(accept=True)
                for s in (zero, digits):
                    self.edge(s, _bm(b"."), dot)
                    self.edge(s, _bm(b"eE"), e0)
                self.edge(dot, _DIGIT, frac)
                self.edge(frac, _DIGIT, frac)
                self.edge(frac, _bm(b"eE"), e0)
                self.edge(e0, _bm(b"+-"), es)
                for s in (e0, es):
                    self.edge(s, _DIGIT, exp)
                self.edge(exp, _DIGIT, exp)
        return self._frag(name, build)

    def literal_frag(self, data: bytes) -> int:
        entry = self.node()
        end = self.node(accept=True)
        self.chain(entry, data, end)
        return entry

    def bool_frag(self) -> int:
        def build(entry: int) -> None:
            end = self.node(accept=True)
            self.chain(entry, b"true", end)
            self.chain(entry, b"false", end)
        return self._frag("bool", build)

    def null_frag(self) -> int:
        def build(entry: int) -> None:
            end = self.node(accept=True)
            self.chain(entry, b"null", end)
        return self._frag("null", build)

    def value_frag(self) -> int:
        """Generic JSON value (recursive)."""
        def build(entry: int) -> None:
            end = self.node(accept=True)
            for alt in (
                self.string_frag(), self.number_frag(),
                self.object_frag(), self.array_frag(),
                self.bool_frag(), self.null_frag(),
            ):
                self.call(entry, alt, end)
        return self._frag("value", build)

    def object_frag(self) -> int:
        """Generic (free-form) JSON object."""
        def build(entry: int) -> None:
            end = self.node(accept=True)
            o_core = self.node()
            self.edge(entry, _bm(b"{"), self.ws_then(o_core))
            self.edge(o_core, _bm(b"}"), end)
            c_core = self.node()
            colon_pre = self.ws_then(c_core)
            self.call(o_core, self.string_frag(), colon_pre)
            v_core = self.node()
            self.edge(c_core, _bm(b":"), self.ws_then(v_core))
            a_core = self.node()
            self.call(v_core, self.value_frag(), self.ws_then(a_core))
            self.edge(a_core, _bm(b"}"), end)
            k_core = self.node()
            self.edge(a_core, _bm(b","), self.ws_then(k_core))
            self.call(k_core, self.string_frag(), colon_pre)
        return self._frag("object", build)

    def array_frag(self) -> int:
        """Generic JSON array."""
        def build(entry: int) -> None:
            end = self.node(accept=True)
            o_core = self.node()
            self.edge(entry, _bm(b"["), self.ws_then(o_core))
            self.edge(o_core, _bm(b"]"), end)
            a_core = self.node()
            after = self.ws_then(a_core)
            self.call(o_core, self.value_frag(), after)
            self.edge(a_core, _bm(b"]"), end)
            n_core = self.node()
            self.edge(a_core, _bm(b","), self.ws_then(n_core))
            self.call(n_core, self.value_frag(), after)
        return self._frag("array", build)

    def finish(self, root_frag: int) -> Grammar:
        """Wrap a fragment as a document: bounded leading whitespace, NO
        trailing loop — once the root closes, only EOS remains unmasked
        and generation terminates instead of babbling whitespace."""
        end = self.node(accept=True)
        core = self.node()
        doc = self.ws_then(core)
        self.call(core, root_frag, end)
        return Grammar(nodes=self.nodes, entry=doc)


def json_grammar(root: str = "object") -> Grammar:
    """Generic JSON grammar. ``root`` is ``"object"`` (OpenAI
    ``json_object`` constrains to an object, not a bare scalar) or
    ``"value"`` (any JSON value)."""
    b = _Builder()
    frag = b.object_frag() if root == "object" else b.value_frag()
    return b.finish(frag)


# --------------------------------------------------------------------------
# JSON-Schema compiler
# --------------------------------------------------------------------------

_MAX_ITEM_STATES = 256


def _resolve_ref(ref: str, root: dict) -> dict:
    if not ref.startswith("#"):
        raise ValueError(f"only local $ref supported, got {ref!r}")
    cur: object = root
    for part in ref.lstrip("#").strip("/").split("/"):
        if not part:
            continue
        part = part.replace("~1", "/").replace("~0", "~")
        if not isinstance(cur, dict) or part not in cur:
            raise ValueError(f"unresolvable $ref {ref!r}")
        cur = cur[part]
    if not isinstance(cur, dict):
        raise ValueError(f"$ref {ref!r} does not point at a schema object")
    return cur


class _SchemaCompiler:
    def __init__(self, root: dict) -> None:
        self.b = _Builder()
        self.root = root
        # id(schema dict) -> fragment entry; registered BEFORE the body
        # builds, so $ref recursion resolves to the same fragment.
        # _keepalive pins every memoized dict: without it a temporary
        # (e.g. the per-type copies a type LIST compiles) could be
        # garbage-collected and its id reused by the next temporary,
        # silently aliasing two different schemas to one fragment.
        self._memo: Dict[int, int] = {}
        self._keepalive: List[dict] = []

    def compile(self, schema) -> int:
        if schema is True or schema == {}:
            return self.b.value_frag()
        if schema is False:
            raise ValueError("schema `false` matches nothing")
        if not isinstance(schema, dict):
            raise ValueError(f"schema must be an object, got {type(schema)}")
        key = id(schema)
        if key in self._memo:
            return self._memo[key]
        if "$ref" in schema:
            target = _resolve_ref(schema["$ref"], self.root)
            entry = self.compile(target)
            self._memo[key] = entry
            self._keepalive.append(schema)
            return entry
        entry = self.b.node()
        self._memo[key] = entry
        self._keepalive.append(schema)
        self._build(schema, entry)
        return entry

    def _alts(self, entry: int, alternatives: Sequence[int]) -> None:
        end = self.b.node(accept=True)
        for alt in alternatives:
            self.b.call(entry, alt, end)

    def _build(self, schema: dict, entry: int) -> None:
        b = self.b
        if "const" in schema:
            self._alts(entry, [self._const_frag(schema["const"])])
            return
        if "enum" in schema:
            vals = schema["enum"]
            if not isinstance(vals, list) or not vals:
                raise ValueError("enum must be a non-empty list")
            self._alts(entry, [self._const_frag(v) for v in vals])
            return
        for comb in ("anyOf", "oneOf"):
            if comb in schema:
                alts = schema[comb]
                if not isinstance(alts, list) or not alts:
                    raise ValueError(f"{comb} must be a non-empty list")
                self._alts(entry, [self.compile(a) for a in alts])
                return
        if "allOf" in schema:
            alts = schema["allOf"]
            if isinstance(alts, list) and len(alts) == 1:
                self._alts(entry, [self.compile(alts[0])])
                return
            raise ValueError("allOf with multiple schemas is not supported")
        t = schema.get("type")
        if isinstance(t, list):
            if not t:
                raise ValueError("type list must be non-empty")
            frags = [
                self.compile({**schema, "type": one}) for one in t
            ]
            self._alts(entry, frags)
            return
        if t == "string":
            self._alts(entry, [b.string_frag()])
        elif t == "number":
            self._alts(entry, [b.number_frag()])
        elif t == "integer":
            self._alts(entry, [b.number_frag(integer=True)])
        elif t == "boolean":
            self._alts(entry, [b.bool_frag()])
        elif t == "null":
            self._alts(entry, [b.null_frag()])
        elif t == "array":
            self._alts(entry, [self._array_frag(schema)])
        elif t == "object":
            props = schema.get("properties")
            if props:
                self._alts(entry, [self._object_frag(schema)])
            else:
                self._alts(entry, [b.object_frag()])
        elif t is None:
            # No type, no combinator: any JSON value.
            self._alts(entry, [b.value_frag()])
        else:
            raise ValueError(f"unsupported schema type {t!r}")

    def _const_frag(self, value) -> int:
        try:
            data = json.dumps(
                value, ensure_ascii=False, separators=(",", ":")
            ).encode("utf-8")
        except (TypeError, ValueError) as e:
            raise ValueError(f"unencodable const/enum value: {e}") from e
        return self.b.literal_frag(data)

    def _array_frag(self, schema: dict) -> int:
        b = self.b
        item = self.compile(schema.get("items", {}))
        mn = int(schema.get("minItems", 0) or 0)
        mx = schema.get("maxItems")
        if mx is not None:
            mx = int(mx)
            if mx < mn:
                raise ValueError("maxItems < minItems")
        bound = mx if mx is not None else mn
        if bound > _MAX_ITEM_STATES:
            raise ValueError(
                f"minItems/maxItems beyond {_MAX_ITEM_STATES} unsupported"
            )
        entry = b.node()
        o_core = b.node()
        end = b.node(accept=True)
        b.edge(entry, _bm(b"["), b.ws_then(o_core))
        if mn == 0:
            b.edge(o_core, _bm(b"]"), end)
        if mx == 0:
            # maxItems: 0 — only the empty array; no item call at all
            # (wiring the first-item call would still accept '[x]').
            return entry
        # after(c): c items consumed so far. Beyond max(mn, 1) items the
        # count stops mattering (unbounded tail loops on the last state).
        n_states = max(bound, 1)
        afters = [b.node() for _ in range(n_states)]
        b.call(o_core, item, b.ws_then(afters[0]))
        for c, af in enumerate(afters, start=1):
            if c >= mn:
                b.edge(af, _bm(b"]"), end)
            if mx is not None and c >= mx:
                continue  # no further items
            nxt = b.node()
            b.edge(af, _bm(b","), b.ws_then(nxt))
            b.call(nxt, item, b.ws_then(afters[min(c, n_states - 1)]))
        return entry

    def _object_frag(self, schema: dict) -> int:
        """Object with declared properties: keys appear in declaration
        order (the order the schema author wrote — the strict-mode
        convention), required keys always present, optional keys
        skippable. Undeclared keys are rejected (strict posture; an
        explicit ``additionalProperties: true`` is not representable in
        a fixed grammar and raises)."""
        b = self.b
        props = schema.get("properties", {})
        if not isinstance(props, dict):
            raise ValueError("properties must be an object")
        if schema.get("additionalProperties") is True:
            raise ValueError(
                "additionalProperties: true with declared properties is "
                "not supported (strict grammar)"
            )
        names = list(props.keys())
        required = set(schema.get("required", []) or [])
        unknown_req = required - set(names)
        if unknown_req:
            raise ValueError(
                f"required names missing from properties: {unknown_req}"
            )
        n = len(names)
        optional = [nm not in required for nm in names]

        # Per-property '"key" ws : ws <value>' fragment (shared by every
        # state that can emit it), ending accept.
        pair_frags: List[int] = []
        for nm in names:
            ent = b.node()
            c_core = b.node()
            b.chain(
                ent,
                json.dumps(nm, ensure_ascii=False).encode("utf-8"),
                b.ws_then(c_core),
            )
            v_core = b.node()
            b.edge(c_core, _bm(b":"), b.ws_then(v_core))
            fin = b.node(accept=True)
            b.call(v_core, self.compile(props[nm]), fin)
            pair_frags.append(ent)

        def reachable(i: int) -> List[int]:
            """Property indices emittable next when properties before
            them (from i) are all optional-and-skipped."""
            out = []
            for j in range(i, n):
                out.append(j)
                if not optional[j]:
                    break
            return out

        def can_close(i: int) -> bool:
            return all(optional[j] for j in range(i, n))

        entry = b.node()
        o_core = b.node()
        end = b.node(accept=True)
        b.edge(entry, _bm(b"{"), b.ws_then(o_core))
        afters = [b.node() for _ in range(n + 1)]  # after prop k emitted
        if can_close(0):
            b.edge(o_core, _bm(b"}"), end)
        for j in reachable(0):
            b.call(o_core, pair_frags[j], b.ws_then(afters[j + 1]))
        for k in range(1, n + 1):
            af = afters[k]
            if can_close(k):
                b.edge(af, _bm(b"}"), end)
            nxt_js = reachable(k)
            if nxt_js:
                comma = b.node()
                b.edge(af, _bm(b","), b.ws_then(comma))
                for j in nxt_js:
                    b.call(comma, pair_frags[j], b.ws_then(afters[j + 1]))
        return entry


def schema_to_grammar(schema) -> Grammar:
    """Compile a JSON Schema (the subset OpenAI structured outputs uses:
    type/properties/required/items/enum/const/anyOf/$ref with recursion,
    plus integer/minItems/maxItems) into a byte grammar. Raises
    ``ValueError`` for unsupported constructs — callers surface it as a
    400."""
    comp = _SchemaCompiler(schema if isinstance(schema, dict) else {})
    frag = comp.compile(schema)
    return comp.b.finish(frag)


# --------------------------------------------------------------------------
# Machine: interned nondeterministic simulation
# --------------------------------------------------------------------------

class GrammarMachine:
    """Simulates a :class:`Grammar` over interned closure'd config sets.

    States are integers (indices into the intern table); ``-1`` means the
    parse died. ``step``/``accepts_end`` are memoized — the memo is what
    makes the token-trie walk in :class:`TokenMasker` cheap (string
    content loops back to the same state, so the walk is a dict hit per
    trie node)."""

    DEAD = -1

    def __init__(self, grammar: Grammar) -> None:
        self.g = grammar
        self._sets: List[frozenset] = []
        self._ids: Dict[frozenset, int] = {}
        self._step_memo: Dict[Tuple[int, int], int] = {}
        self._end_memo: Dict[int, bool] = {}
        self.start = self._intern(
            self._closure({(grammar.entry, ())})
        )

    def _intern(self, configs: frozenset) -> int:
        sid = self._ids.get(configs)
        if sid is None:
            sid = len(self._sets)
            self._sets.append(configs)
            self._ids[configs] = sid
        return sid

    def _closure(self, configs) -> frozenset:
        seen = set(configs)
        work = list(configs)
        nodes = self.g.nodes
        while work:
            node, stk = work.pop()
            nd = nodes[node]
            for entry, ret in nd.calls:
                c = (entry, stk + (ret,))
                if c not in seen:
                    seen.add(c)
                    work.append(c)
            if nd.accept and stk:
                c = (stk[-1], stk[:-1])
                if c not in seen:
                    seen.add(c)
                    work.append(c)
        return frozenset(seen)

    def step(self, sid: int, byte: int) -> int:
        key = (sid, byte)
        hit = self._step_memo.get(key)
        if hit is not None:
            return hit
        nxt = set()
        nodes = self.g.nodes
        bit = 1 << byte
        for node, stk in self._sets[sid]:
            for mask, tgt in nodes[node].edges:
                if mask & bit:
                    nxt.add((tgt, stk))
        res = self.DEAD if not nxt else self._intern(self._closure(nxt))
        self._step_memo[key] = res
        return res

    def step_bytes(self, sid: int, data: bytes) -> int:
        for byte in data:
            sid = self.step(sid, byte)
            if sid == self.DEAD:
                return self.DEAD
        return sid

    def accepts_end(self, sid: int) -> bool:
        hit = self._end_memo.get(sid)
        if hit is None:
            nodes = self.g.nodes
            hit = any(
                nodes[node].accept and not stk
                for node, stk in self._sets[sid]
            )
            self._end_memo[sid] = hit
        return hit


# --------------------------------------------------------------------------
# Tokenizer byte tables + trie
# --------------------------------------------------------------------------

def _bytes_to_unicode_inverse() -> Dict[str, int]:
    """Inverse of GPT-2 byte-level BPE's printable-alias table (the same
    mapping models/clip_bpe.bytes_to_unicode builds)."""
    from multimodal_rag_tpu.models.clip_bpe import bytes_to_unicode

    return {ch: b for b, ch in bytes_to_unicode().items()}


def token_byte_table(tokenizer) -> List[Optional[bytes]]:
    """Per-token emitted byte strings for a DECODER tokenizer; ``None``
    for tokens that must never be sampled inside a grammar (specials,
    unmapped ids). Cached on the tokenizer instance.

    Supports :class:`~.tokenizer.ByteTokenizer` (tests / offline
    fallback) and :class:`~.tokenizer.HFDecoderTokenizer` over both
    byte-level-BPE (Llama-3/Qwen/GPT-OSS — 'Ġ' alias alphabet) and
    SentencePiece-style vocabs (Gemma — '▁' word marker + <0xNN> byte
    fallback)."""
    cached = getattr(tokenizer, "_grammar_byte_table", None)
    if cached is not None:
        return cached
    table: List[Optional[bytes]]
    if hasattr(tokenizer, "_OFFSET") and getattr(
        tokenizer, "name", ""
    ) == "byte":
        off = tokenizer._OFFSET
        table = [None] * tokenizer.vocab_size
        for b in range(256):
            table[off + b] = bytes([b])
    elif hasattr(tokenizer, "_tok"):
        tok = tokenizer._tok
        v = tok.get_vocab_size()
        vocab = tok.get_vocab()
        byte_level = any(k.startswith("Ġ") or k == "Ġ" for k in vocab)
        sp_style = not byte_level and any(
            k.startswith("▁") for k in vocab
        )
        inv = _bytes_to_unicode_inverse() if byte_level else None
        table = [None] * v
        for i in range(v):
            piece = tok.id_to_token(i)
            if piece is None:
                continue
            if byte_level:
                bs = bytearray()
                ok = True
                for ch in piece:
                    b = inv.get(ch)
                    if b is None:
                        ok = False  # special token alphabet
                        break
                    bs.append(b)
                table[i] = bytes(bs) if ok else None
            elif sp_style:
                if (
                    len(piece) == 6
                    and piece.startswith("<0x")
                    and piece.endswith(">")
                ):
                    try:
                        table[i] = bytes([int(piece[3:5], 16)])
                        continue
                    except ValueError:
                        pass
                if piece.startswith("<") and piece.endswith(">"):
                    table[i] = None  # special marker token
                    continue
                table[i] = piece.replace("▁", " ").encode("utf-8")
            else:
                # Unknown scheme: decode-diff against a reference token
                # is fragile; treat the piece text as its bytes.
                table[i] = piece.encode("utf-8")
        # decode('') specials — ids the tokenizer itself renders empty.
        for sid in (
            getattr(tokenizer, "bos_id", None),
            getattr(tokenizer, "eos_id", None),
        ):
            if sid is not None and 0 <= sid < v:
                table[sid] = None
        # Added/special tokens in byte-level vocabs are pure printable-
        # alias ASCII (e.g. '<|im_end|>', '<|eot_id|>') and would map to
        # literal bytes above, staying sampleable inside JSON string
        # content under grammar constraints. Null the FULL added-token
        # id set, not just bos/eos.
        try:
            added = tok.get_added_tokens_decoder()
        except AttributeError:
            added = {}
        for sid in added:
            if 0 <= sid < v:
                table[sid] = None
    else:
        raise ValueError(
            f"no byte table for tokenizer {type(tokenizer).__name__}"
        )
    # Empty byte strings would be always-allowed no-ops (infinite loops).
    table = [t if t else None for t in table]
    tokenizer._grammar_byte_table = table
    return table


class _TokenTrie:
    """Byte trie over a token byte table: flat arrays, one node per
    distinct prefix; token ids recorded at their final byte's node."""

    def __init__(self, table: Sequence[Optional[bytes]]) -> None:
        self.children: List[Dict[int, int]] = [{}]
        self.tokens: List[List[int]] = [[]]
        for tid, data in enumerate(table):
            if data is None:
                continue
            cur = 0
            for b in data:
                nxt = self.children[cur].get(b)
                if nxt is None:
                    nxt = len(self.children)
                    self.children[cur][b] = nxt
                    self.children.append({})
                    self.tokens.append([])
                cur = nxt
            self.tokens[cur].append(tid)


_TRIE_LOCK = threading.Lock()


def _trie_for(tokenizer) -> _TokenTrie:
    # Cached on the tokenizer instance (like _grammar_byte_table) so the
    # cache entry's lifetime equals the keyed object's — an id()-keyed
    # global dict would hand a new tokenizer at a recycled address a
    # trie built for a different vocab.
    trie = getattr(tokenizer, "_grammar_trie", None)
    if trie is not None:
        return trie
    table = token_byte_table(tokenizer)
    with _TRIE_LOCK:
        trie = getattr(tokenizer, "_grammar_trie", None)
        if trie is None:
            trie = _TokenTrie(table)
            tokenizer._grammar_trie = trie
    return trie


# --------------------------------------------------------------------------
# Token masker
# --------------------------------------------------------------------------

class TokenMasker:
    """Per-state vocab masks for one grammar over one tokenizer.

    ``mask_bool(state)`` -> (V,) bool (cached per state); ``advance(
    state, token)`` -> next state or DEAD; ``start`` is the initial
    state. Thread-safe for the decode-server worker-thread pattern (one
    writer at a time per server; the caches are dicts guarded by a
    lock)."""

    def __init__(self, grammar: Grammar, tokenizer,
                 eos_id: int, vocab_size: Optional[int] = None) -> None:
        self.machine = GrammarMachine(grammar)
        # Strong ref: _MASKER_CACHE keys by id(tokenizer); holding the
        # tokenizer here means the id cannot be recycled while the
        # cached masker lives.
        self.tokenizer = tokenizer
        self.table = token_byte_table(tokenizer)
        self.trie = _trie_for(tokenizer)
        # The MODEL vocab can exceed the tokenizer's (padded embedding
        # tables); ids past the table are never allowed.
        self.vocab_size = (
            int(vocab_size) if vocab_size is not None else len(self.table)
        )
        self.eos_id = int(eos_id)
        self.start = self.machine.start
        self._mask_cache: Dict[int, np.ndarray] = {}
        self._adv_cache: Dict[Tuple[int, int], int] = {}
        self._lock = threading.Lock()

    def mask_bool(self, state: int) -> np.ndarray:
        with self._lock:
            m = self._mask_cache.get(state)
            if m is not None:
                return m
        out = np.zeros((self.vocab_size,), bool)
        step = self.machine.step
        stack: List[Tuple[int, int]] = [(0, state)]
        children = self.trie.children
        tokens = self.trie.tokens
        while stack:
            node, sid = stack.pop()
            for tid in tokens[node]:
                out[tid] = True
            for byte, child in children[node].items():
                s2 = step(sid, byte)
                if s2 != GrammarMachine.DEAD:
                    stack.append((child, s2))
        if self.machine.accepts_end(state) and 0 <= self.eos_id:
            if self.eos_id < self.vocab_size:
                out[self.eos_id] = True
        with self._lock:
            self._mask_cache[state] = out
        return out

    def advance(self, state: int, token_id: int) -> int:
        key = (state, int(token_id))
        with self._lock:
            hit = self._adv_cache.get(key)
        if hit is not None:
            return hit
        data = (
            self.table[token_id]
            if 0 <= token_id < len(self.table) else None
        )
        res = (
            self.machine.step_bytes(state, data)
            if data is not None else GrammarMachine.DEAD
        )
        with self._lock:
            self._adv_cache[key] = res
        return res

    def complete(self, state: int) -> bool:
        return self.machine.accepts_end(state)


# --------------------------------------------------------------------------
# Request-facing compilation + caching
# --------------------------------------------------------------------------

_MASKER_CACHE: "Dict[tuple, TokenMasker]" = {}
_MASKER_LOCK = threading.Lock()
_MASKER_CACHE_MAX = 32


def compile_response_format(rf) -> Optional[tuple]:
    """OpenAI ``response_format`` -> a hashable grammar spec
    ``("json", None)`` / ``("schema", canonical_json)`` or None for
    text. Raises ``ValueError`` on malformed input (callers map it to a
    400)."""
    if rf is None:
        return None
    if not isinstance(rf, dict):
        raise ValueError("response_format must be an object")
    rft = rf.get("type")
    if rft in (None, "text"):
        return None
    if rft == "json_object":
        return ("json", None)
    if rft == "json_schema":
        js = rf.get("json_schema")
        if not isinstance(js, dict):
            raise ValueError(
                "response_format.json_schema must be an object"
            )
        schema = js.get("schema")
        if not isinstance(schema, (dict, bool)):
            raise ValueError(
                "response_format.json_schema.schema must be a schema "
                "object"
            )
        # Compile NOW so malformed schemas fail the request up front
        # (and the dump is the cache key). NO key sorting: property
        # ORDER is semantic — the object grammar emits keys in the
        # author's declared order.
        schema_to_grammar(schema)
        return ("schema", json.dumps(schema))
    raise ValueError(f"unsupported response_format type {rft!r}")


def grammar_for_spec(spec: tuple) -> Grammar:
    kind, payload = spec
    if kind == "json":
        return json_grammar("object")
    if kind == "schema":
        return schema_to_grammar(json.loads(payload))
    if kind == "value":
        return json_grammar("value")
    raise ValueError(f"unknown grammar spec kind {kind!r}")


def masker_for(tokenizer, spec: tuple, eos_id: int,
               vocab_size: Optional[int] = None) -> TokenMasker:
    """Cached :class:`TokenMasker` for (tokenizer, grammar spec) — state
    caches (the expensive part: trie walks) are shared across requests
    with the same schema."""
    key = (id(tokenizer), spec, int(eos_id), vocab_size)
    with _MASKER_LOCK:
        m = _MASKER_CACHE.get(key)
    if m is not None:
        return m
    m = TokenMasker(grammar_for_spec(spec), tokenizer, eos_id, vocab_size)
    with _MASKER_LOCK:
        if len(_MASKER_CACHE) >= _MASKER_CACHE_MAX:
            _MASKER_CACHE.clear()
        _MASKER_CACHE[key] = m
    return m
