"""Checkpoint chat-template rendering (models/chat_template.py).

The reference hand-rolled its chat framing and let Ollama apply the real
template server-side (`/root/reference/app/models/llm_adapter.py:266`);
serving weights directly means this framework renders the checkpoint's
own template. Golden-tested against transformers'
``render_jinja_template`` (the exact engine HF tokenizers use), plus the
loader precedence (chat_template.jinja > tokenizer_config.json string >
named-list), special-token extraction, template-error propagation, and
the API wiring (rendered prompt sent with ``raw=True`` so the adapter
skips its generic framing).
"""

import asyncio
import json

import pytest

from multimodal_rag_tpu.models.chat_template import (
    load_chat_template,
    render_chat,
)

CHATML = (
    "{%- for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{%- endfor %}"
    "{%- if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{%- endif %}"
)

LLAMA3ISH = (
    "{{ bos_token }}"
    "{%- for message in messages %}"
    "{%- if message['role'] == 'tool' %}"
    "{{ raise_exception('tool messages are not supported') }}"
    "{%- endif %}"
    "{{ '<|start_header_id|>' + message['role'] + "
    "'<|end_header_id|>\n\n' + message['content'] | trim + eos_token }}"
    "{%- endfor %}"
    "{%- if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}"
    "{%- endif %}"
)

MSGS = [
    {"role": "system", "content": "be brief"},
    {"role": "user", "content": "hello there"},
    {"role": "assistant", "content": "hi"},
    {"role": "user", "content": "explain RAG & cite \"sources\""},
]


class TestRenderGolden:
    @pytest.mark.parametrize("template,tokens", [
        (CHATML, {}),
        (LLAMA3ISH, {"bos_token": "<|begin_of_text|>",
                     "eos_token": "<|eot_id|>"}),
    ])
    def test_matches_transformers_renderer(self, template, tokens):
        from transformers.utils.chat_template_utils import (
            render_jinja_template,
        )

        ours = render_chat(
            {"template": template, **tokens}, MSGS,
            add_generation_prompt=True,
        )
        ref, _ = render_jinja_template(
            conversations=[MSGS], chat_template=template,
            add_generation_prompt=True, **tokens,
        )
        assert ours == ref[0]

    def test_no_generation_prompt(self):
        out = render_chat({"template": CHATML}, MSGS,
                          add_generation_prompt=False)
        assert not out.endswith("<|im_start|>assistant\n")

    def test_template_error_is_value_error(self):
        bad = [{"role": "tool", "content": "x"}]
        with pytest.raises(ValueError, match="tool messages"):
            render_chat(
                {"template": LLAMA3ISH, "bos_token": "", "eos_token": ""},
                bad,
            )


class TestLoader:
    def test_from_tokenizer_config_string(self, tmp_path):
        (tmp_path / "tokenizer_config.json").write_text(json.dumps({
            "chat_template": CHATML,
            "bos_token": {"content": "<s>"},
            "eos_token": "</s>",
        }))
        spec = load_chat_template(str(tmp_path))
        assert spec["template"] == CHATML
        assert spec["bos_token"] == "<s>" and spec["eos_token"] == "</s>"

    def test_jinja_file_wins(self, tmp_path):
        (tmp_path / "tokenizer_config.json").write_text(json.dumps({
            "chat_template": "config-template",
        }))
        (tmp_path / "chat_template.jinja").write_text(CHATML)
        assert load_chat_template(str(tmp_path))["template"] == CHATML

    def test_named_list_picks_default(self, tmp_path):
        (tmp_path / "tokenizer_config.json").write_text(json.dumps({
            "chat_template": [
                {"name": "tool_use", "template": "nope"},
                {"name": "default", "template": CHATML},
            ],
        }))
        assert load_chat_template(str(tmp_path))["template"] == CHATML

    def test_absent_is_none(self, tmp_path):
        (tmp_path / "tokenizer_config.json").write_text(json.dumps({}))
        assert load_chat_template(str(tmp_path)) is None
        assert load_chat_template(None) is None


class TestAPIWiring:
    def test_chat_uses_template_raw(self, tmp_path):
        """With a template-capable adapter the chat handler sends the
        RENDERED prompt and raw=True (no generic re-framing); the
        template error becomes a 400."""
        from aiohttp.test_utils import TestClient, TestServer

        from multimodal_rag_tpu.models.adapters.fake import (
            FakeLLMAdapter,
        )
        from test_api import make_components
        from multimodal_rag_tpu.server.api import create_app

        class TemplatedFake(FakeLLMAdapter):
            def format_chat(self, messages):
                return render_chat(
                    {"template": LLAMA3ISH,
                     "bos_token": "<B>", "eos_token": "<E>"},
                    messages,
                )

            async def generate_text_with_finish(self, prompt,
                                                max_tokens=1000,
                                                temperature=0.7,
                                                raw=False, **kw):
                self.calls.append(
                    {"kind": "finish", "prompt": prompt, "raw": raw}
                )
                return f"Answer to: {prompt[:80]}", "stop"

        loop = asyncio.new_event_loop()
        comps = make_components(tmp_path)
        fake = TemplatedFake()
        comps.llm_adapter = fake
        loop.run_until_complete(comps.initialize())
        app = create_app(components=comps)
        client = TestClient(TestServer(app, loop=loop), loop=loop)
        loop.run_until_complete(client.start_server())
        try:
            resp = loop.run_until_complete(client.post(
                "/v1/chat/completions",
                json={"messages": [
                    {"role": "system", "content": "be brief"},
                    {"role": "user", "content": "hi"},
                ], "max_tokens": 16},
            ))
            assert resp.status == 200
            call = [c for c in fake.calls if c["kind"] == "finish"][-1]
            assert call["raw"] is True
            assert call["prompt"].startswith("<B><|start_header_id|>system")
            assert call["prompt"].endswith(
                "<|start_header_id|>assistant<|end_header_id|>\n\n"
            )
            # A template rejection (tool role) surfaces as a 400.
            resp = loop.run_until_complete(client.post(
                "/v1/chat/completions",
                json={"messages": [{"role": "tool", "content": "x"}],
                      "max_tokens": 8},
            ))
            assert resp.status == 400
        finally:
            loop.run_until_complete(client.close())
            loop.close()


class TestDecoderWiring:
    def test_format_chat(self):
        import jax
        import jax.numpy as jnp

        from multimodal_rag_tpu.models.decoder import (
            DecoderConfig,
            TextDecoder,
            init_params,
        )

        cfg = DecoderConfig(
            vocab_size=256, hidden_dim=32, num_layers=1, num_heads=2,
            num_kv_heads=1, head_dim=16, ff_dim=32, max_position=64,
            compute_dtype=jnp.float32,
        )
        dec = TextDecoder(params=init_params(jax.random.key(0), cfg),
                          cfg=cfg, prompt_buckets=(16,))
        assert dec.format_chat([{"role": "user", "content": "x"}]) is None
        dec.chat_template = {"template": CHATML}
        out = dec.format_chat([{"role": "user", "content": "x"}])
        assert out == "<|im_start|>user\nx<|im_end|>\n<|im_start|>assistant\n"
