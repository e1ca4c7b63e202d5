"""Unit tests for the pure function layer — mirrors the reference's unit
coverage (tests/test_json_utils.py, tests/test_filename_generation.py,
golden parsing fixtures of tests/test_fastvlm_json_parsing.py; see
FIXTURES.md F3/F4)."""

from __future__ import annotations

import json

from file_analyzer_ray.functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    phash64,
    phash_bands,
    simhash64,
)
from file_analyzer_ray.functions.json_extract import (
    extract_json_from_text,
    fallback_response,
    process_model_output,
    repair_json,
    validate_json_structure,
)
from file_analyzer_ray.functions.paths import get_path, matches_patterns, sanitize_name
from file_analyzer_ray.functions.tags import clean_tags, filename_from_description
from file_analyzer_ray.functions.text import (
    bpe_token_count,
    char_shingles,
    detect_language,
    normalize_ws,
    quality_metrics,
    token_count,
)


# --- F3: model-output parsing fixtures --------------------------------
class TestJsonExtraction:
    def test_valid_json_parses_directly(self):
        raw = '{"description": "A red car", "tags": ["car", "red"]}'
        assert extract_json_from_text(raw) == {
            "description": "A red car",
            "tags": ["car", "red"],
        }

    def test_embedded_json_found_by_balanced_scan(self):
        raw = 'Sure! Here you go:\n{"description": "A duck", "tags": ["duck"]}\nBye.'
        assert extract_json_from_text(raw)["description"] == "A duck"

    def test_nested_braces_inside_strings(self):
        raw = 'x {"description": "curly } brace { inside", "tags": ["t1"]} y'
        assert extract_json_from_text(raw)["tags"] == ["t1"]

    def test_prefers_object_with_vision_fields(self):
        raw = '{"foo": 1} and {"description": "d", "tags": []} and {"bar": 2}'
        assert "description" in extract_json_from_text(raw)

    def test_plain_text_returns_none(self):
        assert extract_json_from_text("# Analysis\nJust prose, no JSON here.") is None

    def test_empty_and_none(self):
        assert extract_json_from_text("") is None
        assert extract_json_from_text(None) is None

    def test_malformed_truncated_repairs(self):
        # The 512-token repetition-truncation failure mode (reference
        # golden: tests/test_fastvlm_json_parsing.py:30-32,69-93).
        raw = '{"description": "A shark", "tags": [' + ", ".join(['"shark"'] * 50) + ', "sha'
        assert extract_json_from_text(raw) is None  # not parseable as-is
        repaired = repair_json(raw)
        assert repaired is not None and repaired["description"] == "A shark"
        out = process_model_output(raw, "describe")
        assert out["extracted"] is True
        assert out["attempts"] == 2
        assert out["tags"].count("shark") == 1  # repeats collapsed

    def test_fallback_on_plain_text(self):
        out = process_model_output("no json at all", "describe")
        assert out["extracted"] is False
        assert out["metadata"]["json_parsing_failed"] is True
        assert fallback_response("  x ")["text"] == "x"

    def test_validate_by_mode(self):
        assert validate_json_structure({"description": "d", "tags": []}, "describe")
        assert not validate_json_structure({"description": "d"}, "describe")
        assert validate_json_structure({"objects": [], "description": "d"}, "detect")
        assert validate_json_structure({"text": "t", "document_type": "x"}, "document")
        assert not validate_json_structure("notadict", "describe")
        assert not validate_json_structure({}, "describe")


# --- F4: tag / filename fixtures --------------------------------------
class TestTagsAndFilenames:
    def test_clean_tags_reference_fixture(self):
        tags = ["image", "photo", "shooting", "sh", "duck", "Duck", "DUCK", "wizard", "wizard"]
        assert clean_tags(tags) == ["duck", "wizard"]

    def test_top10_and_order(self):
        tags = [f"tag{i:02d}" for i in range(15)] + ["tag03"] * 3
        out = clean_tags(tags)
        assert len(out) == 10
        assert out[0] == "tag03"  # frequency first
        assert out[1:] == sorted(out[1:])  # then alpha

    def test_filename_letter_number_icon(self):
        assert filename_from_description("The letter T in red font", ".png") == "letter-t.png"
        assert filename_from_description("The number 5 written in blue", ".png") == "number-5.png"
        assert "star" in filename_from_description("An icon of a star", ".png")

    def test_filename_key_objects_and_fallbacks(self):
        assert filename_from_description("a duck next to a car", ".jpg") == "duck-car.jpg"
        assert filename_from_description("", ".jpg") == "unknown-content.jpg"
        assert filename_from_description("   ☃   ", ".jpg") == "unknown-content.jpg"
        long = "word " * 500
        assert filename_from_description(long, ".jpg").endswith(".jpg")


# --- text analysis -----------------------------------------------------
class TestText:
    def test_tokens_and_normalize(self):
        assert token_count("a b  c, d.") == 4
        assert normalize_ws("  a \n b\t c ") == "a b c"
        assert bpe_token_count("hello world's fine") >= 4

    def test_langid(self):
        assert detect_language("the cat and the dog are in the house") == "en"
        assert detect_language("der Hund und die Katze sind nicht da") == "de"
        assert detect_language("1234 9876") == "und"
        assert detect_language("") == "und"

    def test_quality_metrics(self):
        m = quality_metrics("The cat, 42!")
        assert m["n_chars"] == 12.0
        assert 0 < m["alpha_ratio"] < 1
        assert m["digit_ratio"] > 0
        assert quality_metrics("")["n_tokens"] == 0.0

    def test_shingles(self):
        assert char_shingles("abc def", 5) == ["abc d", "bc de", "c def"]
        assert char_shingles("ab", 5) == ["ab"]
        assert char_shingles("", 5) == []


# --- hashing / sketches ------------------------------------------------
class TestHashing:
    def test_phash_robust_to_small_perturbation(self):
        import numpy as np

        rng = np.random.default_rng(1)
        payload = bytearray(rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())
        h1 = phash64(bytes(payload))
        payload[-1] = (payload[-1] + 1) % 256
        payload[-2] = (payload[-2] + 1) % 256
        h2 = phash64(bytes(payload))
        assert hamming64(h1, h2) <= 3
        rng2 = np.random.default_rng(2)
        other = rng2.integers(0, 256, 2000, dtype=np.uint8).tobytes()
        assert hamming64(h1, phash64(other)) > 10

    def test_phash_bands_guarantee(self):
        h1 = phash64(b"x" * 100 + bytes(range(200)))
        h2 = h1 ^ 0b101  # hamming 2 < n_bands-1? (4 bands → ≤3 guaranteed)
        assert set(phash_bands(h1)) & set(phash_bands(h2)) or any(
            a == b for a, b in zip(phash_bands(h1), phash_bands(h2))
        )

    def test_simhash_similarity(self):
        a = "the quick brown fox jumps over the lazy dog".split()
        b = "the quick brown fox jumps over the lazy cat".split()
        c = "completely different words entirely unrelated stuff".split()
        assert hamming64(simhash64(a), simhash64(b)) < hamming64(simhash64(a), simhash64(c))
        assert simhash64([]) == 0

    def test_minhash_estimates_jaccard(self):
        mh = MinHasher(num_perm=128)
        a = set(char_shingles("the quick brown fox jumps over the lazy dog", 4))
        b = set(char_shingles("the quick brown fox jumps over the lazy cat", 4))
        sa, sb = mh.signature(list(a)), mh.signature(list(b))
        est = (sa == sb).mean()
        true = jaccard(a, b)
        assert abs(est - true) < 0.2
        assert (mh.signature(list(a)) == sa).all()  # deterministic


# --- path helpers ------------------------------------------------------
class TestPaths:
    def test_get_path(self):
        d = {"a": {"b": [{"c": 7}]}}
        assert get_path(d, "a.b.0.c") == 7
        assert get_path(d, "a.x", "dflt") == "dflt"
        assert get_path(d, "a.b.9.c", None) is None

    def test_patterns(self):
        assert matches_patterns("x.jpg", ["*.jpg"], ["tmp*"])
        assert not matches_patterns("x.png", ["*.jpg"], [])
        assert not matches_patterns("tmp1.jpg", ["*.jpg"], ["tmp*"])
        assert matches_patterns("anything", [], [])

    def test_sanitize(self):
        assert sanitize_name('a/b\\c:d*e?f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"


def test_score_doc_deterministic():
    from file_analyzer_ray.functions.scoring import score_doc

    r1 = score_doc("ab12cd34ef56", ["amber", "basalt"])
    r2 = score_doc("ab12cd34ef56", ["amber", "basalt"])
    assert r1 == r2
    assert r1["mode"] in ("describe", "detect", "document")
    assert json.dumps(r1)  # serializable


def test_raw_model_output_matches_json_dumps_formulation():
    """The f-string JSON emissions must be byte-identical to the
    json.dumps formulation they replaced (safe because every
    interpolated value is [A-Za-z0-9 ]-only — no escapes possible)."""
    import hashlib
    import json as _json
    import random

    from file_analyzer_ray.functions.scoring import (
        CATEGORIES,
        _OBJECT_BANK,
        _mode_and_style,
        raw_model_output,
    )

    rng = random.Random(7)
    pool = ["The", "quick", "brown", "Fox", "42", "Data", "x9", "lazy"]
    for i in range(2000):
        ch = hashlib.sha256(str(i).encode()).hexdigest()
        words = rng.sample(pool, k=rng.randint(0, 6))
        h = int(ch[:12], 16)
        mode, style = _mode_and_style(h)
        got_mode, got = raw_model_output(ch, list(words))
        assert got_mode == mode
        if style < 80:
            # the valid-JSON bucket must parse and round-trip via dumps
            assert got == _json.dumps(_json.loads(got))


class TestEscalatingRetry:
    """T2 re-ask semantics (reference src/models/fastvlm/json.py:118-253):
    a non-compliant emission is re-asked up to 3x with stricter prompts;
    a stricter prompt deterministically flips a subset of plain-text
    emitters to compliance, and the rest fall back after 3 attempts."""

    def test_prompt_ladder_escalates(self):
        from file_analyzer_ray.functions.scoring import prompt_for

        p1, p2, p3 = (prompt_for("describe", a) for a in (1, 2, 3))
        assert p1 != p2 != p3
        assert p1 in p2 or p2.startswith(p1.split(".")[0])
        assert "ONLY" in p2 and "NOTHING ELSE" in p3
        assert prompt_for("describe", 99) == p3  # capped

    def test_retry_success_on_second_attempt(self):
        from file_analyzer_ray.functions.scoring import score_doc

        # style>=97 (plain text at attempt 1), hash bit 7 == 0 → the
        # strict attempt-2 prompt produces valid JSON.
        r = score_doc("65a699905c026193", ["alpha", "beta"])
        assert r["model_status"] == "extracted"
        assert r["attempts"] == 2

    def test_retry_success_on_third_attempt(self):
        from file_analyzer_ray.functions.scoring import score_doc

        # bit 7 == 1, bit 8 == 0 → only the strictest prompt lands.
        r = score_doc("f5ca38f748a1d6ea", ["alpha", "beta"])
        assert r["model_status"] == "extracted"
        assert r["attempts"] == 3

    def test_fallback_after_max_retries(self):
        from file_analyzer_ray.functions.scoring import score_doc

        # bits 7 and 8 both set → never complies; falls back after 3.
        r = score_doc("2c624232cdd22177", ["alpha", "beta"])
        assert r["model_status"] == "fallback"
        assert r["attempts"] == 3

    def test_compliant_docs_never_reasked(self):
        import hashlib

        from file_analyzer_ray.functions.scoring import (
            _mode_and_style,
            score_doc,
        )

        n = 0
        for i in range(500):
            ch = hashlib.sha256(str(i).encode()).hexdigest()
            h = int(ch[:12], 16)
            if _mode_and_style(h)[1] < 80:  # valid-JSON emitters
                assert score_doc(ch, ["w"])["attempts"] == 1
                n += 1
        assert n > 100


class TestMainContent:
    """Boilerplate-strip heuristics (stages/maincontent.py)."""

    def test_chrome_containers_dropped(self):
        from file_analyzer_ray.stages.maincontent import extract_main

        html = (
            "<html><head><title>T</title><style>p{x}</style>"
            "<script>var a='<p>fake</p>';</script></head><body>"
            "<header><h1>Site</h1><nav><a href='/'>Home</a></nav></header>"
            "<aside><p>Sponsored</p></aside>"
            "<p>real content here</p>"
            "<footer><p>legal</p></footer></body></html>"
        )
        main, n = extract_main(html)
        assert main == "real content here"
        assert n == 1

    def test_link_density_drops_link_farms_only(self):
        from file_analyzer_ray.stages.maincontent import extract_main

        html = (
            "<body><div><p><a>one</a> <a>two</a> <a>three</a></p></div>"
            "<p>prose with an inline <a>anchor</a> kept because text dominates"
            " around it in this long block</p></body>"
        )
        main, n = extract_main(html)
        assert "one" not in main and "kept" in main and "anchor" in main
        assert n == 1

    def test_nested_containers_and_unbalanced_close(self):
        from file_analyzer_ray.stages.maincontent import extract_main

        html = (
            "<nav><div><p>deep chrome</p></div></nav></nav>"
            "<p>after stray close</p>"
        )
        main, n = extract_main(html)
        assert main == "after stray close"
        assert n == 1

    def test_whitespace_normalized_and_blocks_joined(self):
        from file_analyzer_ray.stages.maincontent import extract_main

        main, n = extract_main("<p>a\n  b</p><div>c\td</div>")
        assert main == "a b c d"
        assert n == 2

    def test_empty_and_tagless(self):
        from file_analyzer_ray.stages.maincontent import extract_main

        assert extract_main("") == ("", 0)
        assert extract_main("bare text no tags") == ("bare text no tags", 1)

    def test_wrap_golden_roundtrip(self):
        """The deterministic wrap's ground truth: extractor recovers
        exactly the normalized source text, ceil(tokens/10) blocks."""
        import pyarrow as pa

        from file_analyzer_ray.stages.maincontent import (
            MainContentStage,
            wrap_documents_html,
        )

        texts = ["", "one", " ".join(f"w{i}" for i in range(25))]
        t = pa.Table.from_arrays(
            [
                pa.array([1, 2, 3], pa.int64()),
                pa.array(["web", "web", "books"]),
                pa.array(texts),
            ],
            names=["doc_id", "source", "text"],
        )
        out = MainContentStage()(wrap_documents_html(t))
        assert out.column("main_text").to_pylist() == [
            " ".join(x.split()) for x in texts
        ]
        assert out.column("n_blocks").to_pylist() == [0, 1, 3]


class TestLinkExtraction:
    def test_basic_and_quoting_variants(self):
        from file_analyzer_ray.stages.maincontent import extract_links

        html = (
            '<p><a href="/a">first</a> text <a href=\'/b\'>second one</a>'
            " <a href=/c>bare</a> <a>no href</a></p>"
        )
        assert extract_links(html) == [
            ("/a", "first"), ("/b", "second one"), ("/c", "bare"),
        ]

    def test_nested_markup_and_unclosed(self):
        from file_analyzer_ray.stages.maincontent import extract_links

        html = '<a href="/x"><b>bold</b> tail'
        assert extract_links(html) == [("/x", "bold tail")]
        html2 = '<a href="/1">one<a href="/2">two</a>'
        assert extract_links(html2) == [("/1", "one"), ("/2", "two")]

    def test_script_anchor_ignored(self):
        from file_analyzer_ray.stages.maincontent import extract_links

        html = "<script>var s='<a href=/fake>x</a>';</script><a href=/r>r</a>"
        assert extract_links(html) == [("/r", "r")]

    def test_wrapped_docs_known_links(self):
        import pyarrow as pa

        from file_analyzer_ray.stages.maincontent import (
            LinkExtractStage,
            wrap_documents_html,
        )

        t = pa.Table.from_arrays(
            [pa.array([7], pa.int64()), pa.array(["web"]), pa.array(["x y z"])],
            names=["doc_id", "source", "text"],
        )
        out = LinkExtractStage()(wrap_documents_html(t))
        assert out.column("href").to_pylist() == [
            "/", "/s", "/t", "/buy", "/now", "/1", "/2", "/terms",
        ]
        assert out.column("position").to_pylist() == list(range(8))


class TestLayoutParse:
    def test_furniture_columns_and_reading_order(self):
        from file_analyzer_ray.stages.layout import parse_layout

        boxes = [
            # page 0 body, two columns, deliberately out of order
            {"page": 0, "x": 350.0, "y": 120.0, "text": "col2 second"},
            {"page": 0, "x": 50.0, "y": 140.0, "text": "col1 third"},
            {"page": 0, "x": 50.0, "y": 100.0, "text": "col1 first"},
            {"page": 0, "x": 350.0, "y": 100.0, "text": "col2 first"},
            # running furniture on both pages
            {"page": 0, "x": 50.0, "y": 10.0, "text": "acme report"},
            {"page": 1, "x": 50.0, "y": 10.0, "text": "acme report"},
            {"page": 0, "x": 50.0, "y": 900.0, "text": "footer"},
            {"page": 1, "x": 50.0, "y": 900.0, "text": "footer"},
            # page 1 body
            {"page": 1, "x": 50.0, "y": 100.0, "text": "page two"},
        ]
        main, n_pages, n_dropped = parse_layout(boxes)
        assert main == "col1 first col1 third col2 first col2 second page two"
        assert n_pages == 2 and n_dropped == 4

    def test_single_column_no_false_split(self):
        from file_analyzer_ray.stages.layout import parse_layout

        boxes = [
            {"page": 0, "x": 50.0, "y": 140.0, "text": "b"},
            {"page": 0, "x": 52.0, "y": 100.0, "text": "a"},
            {"page": 0, "x": 54.0, "y": 180.0, "text": "c"},
        ]
        main, n_pages, n_dropped = parse_layout(boxes)
        assert main == "a b c" and n_pages == 1 and n_dropped == 0

    def test_empty(self):
        from file_analyzer_ray.stages.layout import parse_layout

        assert parse_layout([]) == ("", 0, 0)

    def test_wrap_golden_roundtrip(self):
        import pyarrow as pa

        from file_analyzer_ray.stages.layout import (
            LayoutParseStage,
            wrap_documents_layout,
        )

        texts = ["", " ".join(f"w{i}" for i in range(25)),
                 " ".join(f"v{i}" for i in range(100))]
        t = pa.Table.from_arrays(
            [pa.array([1, 2, 3], pa.int64()),
             pa.array(["web", "web", "books"]),
             pa.array(texts)],
            names=["doc_id", "source", "text"],
        )
        out = LayoutParseStage()(wrap_documents_layout(t))
        assert out.column("main_text").to_pylist() == [
            " ".join(x.split()) for x in texts
        ]
        # 25 tokens -> 5 lines -> 1 body page -> padded to 2;
        # 100 tokens -> 17 lines -> 3 pages
        assert out.column("n_pages").to_pylist() == [2, 2, 3]
        assert out.column("n_dropped").to_pylist() == [4, 4, 6]


class TestPiiScrub:
    def test_generic_patterns(self):
        from file_analyzer_ray.stages.pii import scrub_text

        c, ne, np_, ni = scrub_text(
            "mail a.b+c@sub.example.org or call +44-202-555-0199; "
            "server at 192.168.1.254 and 8.8.8.8"
        )
        assert ne == 1 and np_ == 1 and ni == 2
        assert "[EMAIL]" in c and "[PHONE]" in c and c.count("[IP]") == 2
        assert "example.org" not in c and "192.168" not in c

    def test_no_false_positives_on_word_salad(self):
        from file_analyzer_ray.stages.pii import scrub_text

        c, ne, np_, ni = scrub_text("the fast key order sort 42 table")
        assert (ne, np_, ni) == (0, 0, 0)
        assert c == "the fast key order sort 42 table"

    def test_email_scrubbed_before_phone_halves(self):
        from file_analyzer_ray.stages.pii import scrub_text

        # an address containing digit runs must not leave a phone match
        c, ne, np_, ni = scrub_text("x 555-123-4567@example.com y")
        assert ne == 1 and np_ == 0
        assert c == "x [EMAIL] y"

    def test_injection_roundtrip(self):
        import pyarrow as pa

        from file_analyzer_ray.stages.pii import PiiScrubStage, inject_pii

        texts = ["", "a b c", "w0 w1 w2 w3 w4"]
        t = pa.Table.from_arrays(
            [pa.array([1, 2, 3], pa.int64()), pa.array(texts)],
            names=["doc_id", "text"],
        )
        out = PiiScrubStage()(inject_pii(t))
        assert out.column("clean_text").to_pylist() == [
            "", "a b c", "w0 w1 [EMAIL] w2 w3 w4 [PHONE]",
        ]
        assert out.column("n_emails").to_pylist() == [0, 0, 1]
        assert out.column("n_phones").to_pylist() == [0, 0, 1]


def test_layout_fused_equals_two_stage(ray_session):
    """The fused wrap+parse path (no Arrow list<struct> roundtrip)
    equals the explicit wrap -> parse plan row for row."""
    import ray.data

    from file_analyzer_ray.stages.layout import (
        LayoutParseStage,
        layout_from_docs,
        wrap_documents_layout,
    )

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "text"],
        override_num_blocks=4,
    )
    fused = (
        layout_from_docs(ds).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    two = (
        ds.map_batches(wrap_documents_layout, batch_format="pyarrow")
        .map_batches(LayoutParseStage(), batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert fused.equals(two)
