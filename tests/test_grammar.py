"""Grammar-constrained decoding: the byte-level RTN engine, the JSON and
JSON-Schema grammars, and the token-trie masker (models/grammar.py).

Oracle strategy: the machine's per-token verdicts are checked against
brute force (walk every token's bytes one by one), and constrained
random walks must always terminate in text that ``json.loads`` parses
and that satisfies the schema's constraints."""

import json

import numpy as np
import pytest

from multimodal_rag_tpu.models.grammar import (
    GrammarMachine,
    TokenMasker,
    compile_response_format,
    json_grammar,
    masker_for,
    schema_to_grammar,
    token_byte_table,
)
from multimodal_rag_tpu.models.tokenizer import ByteTokenizer


def accepts(grammar, text: str) -> bool:
    m = GrammarMachine(grammar)
    sid = m.step_bytes(m.start, text.encode("utf-8"))
    return sid != m.DEAD and m.accepts_end(sid)


def alive(grammar, text: str) -> bool:
    m = GrammarMachine(grammar)
    return m.step_bytes(m.start, text.encode("utf-8")) != m.DEAD


class TestJsonGrammar:
    @pytest.mark.parametrize("doc", [
        '{}',
        '{"a": 1}',
        '{ "a" : [1, 2.5, -3e2, true, false, null] }',
        '{"nested": {"x": {"y": []}}}',
        '{"s": "with \\"escape\\" and \\u00e9"}',
        '  {"leading": "ws"}',
        '{"unicode": "héllo"}',
        '{"many": [{}, {"k": "v"}, [[]]]}',
    ])
    def test_accepts_valid_objects(self, doc):
        assert accepts(json_grammar("object"), doc)

    @pytest.mark.parametrize("doc", [
        '42', '"str"', 'true', '[1]',  # not objects
        '{"a": }', '{a: 1}', "{'a': 1}", '{"a": 1,}', '{"a" 1}',
        '{"a": 01}', '{"a": +1}', '{"a": .5}', '{"a": 1.}',
        '{} {}', '{}extra',
    ])
    def test_rejects_invalid(self, doc):
        assert not accepts(json_grammar("object"), doc)

    @pytest.mark.parametrize("doc", [
        '42', '-3.25e-2', '"str"', 'true', 'null', '[1, "two", {}]',
    ])
    def test_value_root_accepts_scalars(self, doc):
        assert accepts(json_grammar("value"), doc)

    def test_incomplete_is_alive_but_not_accepting(self):
        g = json_grammar("object")
        for prefix in ['{', '{"a"', '{"a": [1,', '{"a": "unterminated']:
            assert alive(g, prefix)
            assert not accepts(g, prefix)

    def test_number_can_end_or_continue(self):
        g = json_grammar("value")
        m = GrammarMachine(g)
        sid = m.step_bytes(m.start, b"42")
        assert m.accepts_end(sid)
        sid2 = m.step_bytes(sid, b".5")
        assert sid2 != m.DEAD and m.accepts_end(sid2)


class TestSchemaGrammar:
    def test_required_and_optional_ordered(self):
        g = schema_to_grammar({
            "type": "object",
            "properties": {
                "a": {"type": "integer"},
                "b": {"type": "string"},
                "c": {"type": "boolean"},
            },
            "required": ["a", "c"],
        })
        assert accepts(g, '{"a": 1, "b": "x", "c": true}')
        assert accepts(g, '{"a": 1, "c": false}')  # optional b skipped
        assert not accepts(g, '{"a": 1, "b": "x"}')  # missing required c
        assert not accepts(g, '{"b": "x", "a": 1, "c": true}')  # order
        assert not accepts(g, '{"a": 1, "c": true, "d": 0}')  # undeclared
        assert not accepts(g, '{"a": "str", "c": true}')  # wrong type

    def test_empty_object_when_all_optional(self):
        g = schema_to_grammar({
            "type": "object",
            "properties": {"a": {"type": "integer"}},
        })
        assert accepts(g, '{}')
        assert accepts(g, '{"a": 5}')

    def test_enum_and_const(self):
        g = schema_to_grammar({"enum": ["red", "green", 3, None]})
        for ok in ['"red"', '"green"', '3', 'null']:
            assert accepts(g, ok)
        for bad in ['"blue"', '4', '"3"']:
            assert not accepts(g, bad)
        g2 = schema_to_grammar({"const": {"k": [1]}})
        assert accepts(g2, '{"k":[1]}')
        assert not accepts(g2, '{"k":[2]}')

    def test_integer_vs_number(self):
        gi = schema_to_grammar({"type": "integer"})
        assert accepts(gi, '-42')
        assert not accepts(gi, '4.2')
        assert not accepts(gi, '1e3')
        gn = schema_to_grammar({"type": "number"})
        assert accepts(gn, '4.2')
        assert accepts(gn, '1e3')

    def test_array_bounds(self):
        g = schema_to_grammar({
            "type": "array", "items": {"type": "integer"},
            "minItems": 2, "maxItems": 3,
        })
        assert not accepts(g, '[]')
        assert not accepts(g, '[1]')
        assert accepts(g, '[1, 2]')
        assert accepts(g, '[1, 2, 3]')
        assert not accepts(g, '[1, 2, 3, 4]')
        assert not accepts(g, '[1, "x"]')

    def test_array_max_items_zero(self):
        """maxItems: 0 — only the empty array; '[x]' must not parse
        (r3 advisor: the first-item call used to be wired
        unconditionally)."""
        g = schema_to_grammar({
            "type": "array", "items": {"type": "integer"},
            "maxItems": 0,
        })
        assert accepts(g, '[]')
        assert accepts(g, '[ ]')
        assert not accepts(g, '[1]')
        assert not accepts(g, '[1, 2]')

    def test_array_unbounded(self):
        g = schema_to_grammar({"type": "array", "items": {"type": "null"}})
        assert accepts(g, '[]')
        assert accepts(g, '[null, null, null, null, null]')

    def test_anyof_and_type_list(self):
        g = schema_to_grammar({
            "anyOf": [{"type": "string"}, {"type": "integer"}]
        })
        assert accepts(g, '"x"') and accepts(g, '7')
        assert not accepts(g, 'true')
        g2 = schema_to_grammar({"type": ["string", "null"]})
        assert accepts(g2, '"x"') and accepts(g2, 'null')
        assert not accepts(g2, '1')

    def test_ref_recursion(self):
        schema = {
            "$defs": {
                "node": {
                    "type": "object",
                    "properties": {
                        "v": {"type": "integer"},
                        "kids": {
                            "type": "array",
                            "items": {"$ref": "#/$defs/node"},
                        },
                    },
                    "required": ["v"],
                }
            },
            "$ref": "#/$defs/node",
        }
        g = schema_to_grammar(schema)
        assert accepts(g, '{"v": 1}')
        assert accepts(
            g, '{"v": 1, "kids": [{"v": 2, "kids": [{"v": 3}]}]}'
        )
        assert not accepts(g, '{"kids": []}')

    def test_free_form_falls_back_to_json(self):
        g = schema_to_grammar({"type": "object"})
        assert accepts(g, '{"anything": [1, {"goes": null}]}')
        g2 = schema_to_grammar({})
        assert accepts(g2, '[1, "two"]')

    @pytest.mark.parametrize("schema", [
        {"type": "frobnicate"},
        {"enum": []},
        {"allOf": [{"type": "string"}, {"type": "integer"}]},
        {"$ref": "#/$defs/missing"},
        {"type": "array", "minItems": 100000},
        {
            "type": "object",
            "properties": {"a": {"type": "integer"}},
            "additionalProperties": True,
        },
        {
            "type": "object",
            "properties": {"a": {}},
            "required": ["zz"],
        },
    ])
    def test_unsupported_raises(self, schema):
        with pytest.raises(ValueError):
            schema_to_grammar(schema)


class TestTokenMasker:
    def test_mask_matches_bruteforce(self):
        tok = ByteTokenizer()
        masker = TokenMasker(json_grammar("object"), tok, tok.eos_id)
        table = token_byte_table(tok)
        state = masker.start
        # Walk a few states deep and cross-check every token's verdict.
        for advance_text in [None, b'{', b'"k', b'": 12']:
            if advance_text is not None:
                state = masker.machine.step_bytes(state, advance_text)
            mask = masker.mask_bool(state)
            for tid, data in enumerate(table):
                if tid == tok.eos_id:
                    expect = masker.machine.accepts_end(state)
                elif data is None:
                    expect = False
                else:
                    expect = (
                        masker.machine.step_bytes(state, data)
                        != GrammarMachine.DEAD
                    )
                assert mask[tid] == expect, (advance_text, tid, data)

    def test_mask_cache_hit(self):
        tok = ByteTokenizer()
        masker = TokenMasker(json_grammar("object"), tok, tok.eos_id)
        m1 = masker.mask_bool(masker.start)
        m2 = masker.mask_bool(masker.start)
        assert m1 is m2

    @pytest.mark.parametrize("spec", [
        ("json", None),
        ("schema", json.dumps({
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "tags": {
                    "type": "array", "items": {"enum": ["a", "b"]},
                    "maxItems": 3,
                },
                "count": {"type": "integer"},
            },
            "required": ["name", "count"],
        }, sort_keys=True)),
    ])
    def test_constrained_random_walk_yields_valid_json(self, spec):
        """Sampling ANY allowed token at every step must terminate in
        parseable JSON (the core guarantee constrained decoding makes)."""
        tok = ByteTokenizer()
        masker = masker_for(tok, spec, tok.eos_id)
        # Tokens that tend to CLOSE structures — steered toward with
        # growing probability so random walks terminate instead of
        # nesting/stringing forever.
        closer_ids = {tok.encode(c)[-1] for c in ('"', '}', ']')}
        rng = np.random.default_rng(0)
        for trial in range(8):
            state = masker.start
            out = []
            for step_i in range(600):
                mask = masker.mask_bool(state)
                ids = np.flatnonzero(mask)
                assert ids.size > 0, "dead end reached"
                if mask[tok.eos_id] and rng.random() < 0.5:
                    break
                p_close = min(0.95, 0.5 + step_i / 200)
                closers = [i for i in ids if int(i) in closer_ids]
                if closers and rng.random() < p_close:
                    choice = int(rng.choice(closers))
                else:
                    choice = int(rng.choice(ids))
                if choice == tok.eos_id:
                    break
                out.append(choice)
                state = masker.advance(state, choice)
                assert state != GrammarMachine.DEAD
            else:
                pytest.fail("walk did not terminate")
            text = tok.decode(out)
            parsed = json.loads(text)  # must not raise
            if spec[0] == "schema":
                assert isinstance(parsed, dict)
                assert "name" in parsed and "count" in parsed
                assert isinstance(parsed["count"], int)
                for t in parsed.get("tags", []):
                    assert t in ("a", "b")

    def test_eos_only_after_root_closes(self):
        tok = ByteTokenizer()
        masker = TokenMasker(json_grammar("object"), tok, tok.eos_id)
        state = masker.machine.step_bytes(masker.start, b'{"a": 1}')
        mask = masker.mask_bool(state)
        assert mask[tok.eos_id]
        assert mask.sum() == 1  # no trailing whitespace loop: EOS only

    def test_byte_table_rejects_specials(self):
        tok = ByteTokenizer()
        table = token_byte_table(tok)
        assert table[tok.pad_id] is None
        assert table[tok.bos_id] is None
        assert table[tok.eos_id] is None
        assert table[tok.encode("a")[-1]] == b"a"

    def test_byte_table_nulls_added_tokens(self):
        """Added/special tokens in byte-level vocabs (e.g. '<|im_end|>')
        are pure printable-alias ASCII and would otherwise map to
        literal bytes, staying sampleable inside JSON strings under
        grammar constraints (r3 advisor)."""
        from tokenizers import Tokenizer
        from tokenizers.models import BPE

        from multimodal_rag_tpu.models.clip_bpe import bytes_to_unicode

        vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
        hf = Tokenizer(BPE(vocab=vocab, merges=[]))
        hf.add_special_tokens(["<|im_end|>"])
        special_id = hf.token_to_id("<|im_end|>")

        class Wrapped:
            _tok = hf
            vocab_size = hf.get_vocab_size()
            bos_id = None
            eos_id = None

        table = token_byte_table(Wrapped())
        assert table[special_id] is None
        assert table[hf.token_to_id("a")] == b"a"

    def test_trie_and_table_cached_on_tokenizer_instance(self):
        """Caches must live on the keyed object, not in id()-keyed
        globals (r3 advisor: id reuse after GC hands a new tokenizer a
        trie built for a different vocab)."""
        from multimodal_rag_tpu.models.grammar import _trie_for

        tok = ByteTokenizer()
        assert _trie_for(tok) is _trie_for(tok)
        assert getattr(tok, "_grammar_trie", None) is not None
        m = masker_for(tok, ("json", None), tok.eos_id)
        assert m.tokenizer is tok  # keepalive: id(tok) can't recycle


class TestResponseFormat:
    def test_parse_variants(self):
        assert compile_response_format(None) is None
        assert compile_response_format({"type": "text"}) is None
        assert compile_response_format(
            {"type": "json_object"}
        ) == ("json", None)
        spec = compile_response_format({
            "type": "json_schema",
            "json_schema": {
                "name": "x",
                "schema": {"type": "object",
                           "properties": {"a": {"type": "integer"}}},
            },
        })
        assert spec[0] == "schema"

    @pytest.mark.parametrize("rf", [
        "json", {"type": "yaml"}, {"type": "json_schema"},
        {"type": "json_schema", "json_schema": {"schema": 5}},
        {"type": "json_schema",
         "json_schema": {"schema": {"type": "bogus"}}},
    ])
    def test_bad_formats_raise(self, rf):
        with pytest.raises(ValueError):
            compile_response_format(rf)

    def test_masker_cache_shared(self):
        tok = ByteTokenizer()
        a = masker_for(tok, ("json", None), tok.eos_id)
        b = masker_for(tok, ("json", None), tok.eos_id)
        assert a is b
