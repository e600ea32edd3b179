"""Chunking contract tests (reference parser.py:162-169, 1564-1766)."""

import re

from multimodal_rag_tpu.ingest.chunking import (
    RecursiveTextSplitter,
    basic_chunk_text,
    chunk_simple,
    chunk_structured,
    chunk_with_pages,
    enrich_chunks_metadata,
    generate_doc_id,
)


def make_text(n_paras=30, para_len=300):
    return "\n\n".join(
        f"Paragraph {i}. " + "lorem ipsum dolor sit amet. " * (para_len // 28)
        for i in range(n_paras)
    )


class TestRecursiveSplitter:
    def test_short_text_single_chunk(self):
        s = RecursiveTextSplitter(chunk_size=1000, chunk_overlap=200)
        assert s.split_text("hello world") == ["hello world"]

    def test_empty(self):
        s = RecursiveTextSplitter()
        assert s.split_text("") == []

    def test_chunks_within_size(self):
        s = RecursiveTextSplitter(chunk_size=1000, chunk_overlap=200)
        for chunk in s.split_text(make_text()):
            assert len(chunk) <= 1000

    def test_prefers_paragraph_boundaries(self):
        # Two paragraphs each < chunk_size but > size together: split at \n\n.
        a = "A" * 600
        b = "B" * 600
        s = RecursiveTextSplitter(chunk_size=1000, chunk_overlap=200)
        chunks = s.split_text(a + "\n\n" + b)
        assert chunks == [a, b]

    def test_overlap_carries_tail(self):
        # Sentences of ~100 chars; successive chunks must share a tail.
        sentences = [f"Sentence number {i:03d} " + "x" * 80 + ". " for i in range(40)]
        text = "".join(sentences)
        s = RecursiveTextSplitter(chunk_size=500, chunk_overlap=150)
        chunks = s.split_text(text)
        assert len(chunks) > 2
        for prev, nxt in zip(chunks, chunks[1:]):
            # The start of the next chunk appears inside the previous chunk.
            head = nxt[:50]
            assert head in prev

    def test_all_content_covered(self):
        text = make_text(10, 200)
        s = RecursiveTextSplitter(chunk_size=400, chunk_overlap=100)
        chunks = s.split_text(text)
        pos = 0
        for chunk in chunks:
            found = text.find(chunk, pos)
            assert found >= 0, "chunks must appear in order in the source"
            pos = found

    def test_unbreakable_run_falls_through_separators(self):
        text = "X" * 2500  # no separators at all → char-level split + merge
        s = RecursiveTextSplitter(chunk_size=1000, chunk_overlap=200)
        chunks = s.split_text(text)
        assert all(len(c) <= 1000 for c in chunks)
        assert sum(len(c) for c in chunks) >= 2500  # overlap means >= source

    def test_separator_attached_to_following_piece(self):
        # keep_separator semantics: ". " belongs to the start of the next
        # piece, so merged chunks never end with a dangling separator gap.
        text = "alpha. beta. gamma. delta"
        s = RecursiveTextSplitter(chunk_size=12, chunk_overlap=0)
        chunks = s.split_text(text)
        assert chunks[0].startswith("alpha")
        assert "beta" in "".join(chunks)

    def test_reference_defaults(self):
        s = RecursiveTextSplitter()
        assert s.chunk_size == 1000
        assert s.chunk_overlap == 200
        assert s.separators == ["\n\n\n", "\n\n", "\n", ". ", " ", ""]


class TestBasicChunker:
    def test_sentence_boundary_backoff(self):
        text = ("A" * 700 + ". ") + ("B" * 900 + ". ") + "C" * 100
        chunks = basic_chunk_text(text, chunk_size=1000, chunk_overlap=200)
        # First chunk should break at the '. ' after the A-run (pos 701 > 500).
        assert chunks[0] == "A" * 700 + "."

    def test_no_boundary_before_midpoint(self):
        text = "A" * 30 + ". " + "B" * 2000
        chunks = basic_chunk_text(text, chunk_size=1000, chunk_overlap=200)
        # Boundary at 30 <= 500 → hard cut at 1000 chars.
        assert len(chunks[0]) == 1000

    def test_window_slide(self):
        text = "x" * 2500
        chunks = basic_chunk_text(text, chunk_size=1000, chunk_overlap=200)
        # Reference window arithmetic (parser.py:1702-1736): start slides by
        # end-overlap even past the final window, re-emitting a short tail:
        # [0:1000], [800:1800], [1600:2600→2500], [2400:2500].
        assert [len(c) for c in chunks] == [1000, 1000, 900, 100]

    def test_empty(self):
        assert basic_chunk_text("") == []
        assert basic_chunk_text("   \n ") == []


class TestChunkObjects:
    def test_chunk_with_pages_spans(self):
        pages = [
            {"page": 1, "text": "alpha " * 120},
            {"page": 2, "text": "beta " * 120},
            {"page": 3, "text": "gamma " * 120},
        ]
        chunks = chunk_with_pages(pages, "f.pdf", total_pages=3)
        assert chunks[0]["metadata"]["page"] == 1
        assert chunks[0]["metadata"]["total_pages"] == 3
        assert chunks[0]["metadata"]["source"] == "f.pdf"
        spanning = [c for c in chunks if c["metadata"]["pages_spanned"]]
        for c in spanning:
            assert len(c["metadata"]["pages_spanned"]) > 1

    def test_chunk_structured_sections(self):
        sections = [
            {"heading": "Intro", "level": 1, "content": ["Hello world."]},
            {"heading": "Body", "level": 2, "content": ["More text.", "Even more."]},
            {"heading": "Empty", "level": 2, "content": []},
        ]
        chunks = chunk_structured(sections, "d.docx")
        assert len(chunks) == 2
        assert chunks[0]["metadata"]["section"] == "Intro"
        assert chunks[1]["metadata"]["heading_level"] == 2
        assert chunks[1]["content"] == "More text.\n\nEven more."

    def test_chunk_simple_metadata(self):
        chunks = chunk_simple("hello world", {"source": "t.txt"})
        assert chunks[0]["metadata"]["source"] == "t.txt"
        assert chunks[0]["metadata"]["char_count"] == len("hello world")

    def test_enrich_ids(self):
        chunks = chunk_simple("hello world", {"source": "t.txt"})
        enrich_chunks_metadata(chunks, "doc_abc123", "t.txt", "text")
        cid = chunks[0]["chunk_id"]
        assert re.fullmatch(r"doc_abc123_chunk_0_[0-9a-f]{8}", cid)
        assert chunks[0]["metadata"]["doc_id"] == "doc_abc123"
        assert chunks[0]["metadata"]["doc_type"] == "text"

    def test_generate_doc_id(self):
        did = generate_doc_id(b"content", "My File-1.pdf")
        assert re.fullmatch(r"My_File_1_[0-9a-f]{12}", did)
        # Deterministic in content.
        assert did == generate_doc_id(b"content", "My File-1.pdf")
        assert did != generate_doc_id(b"other", "My File-1.pdf")
