"""Property-based tests (hypothesis) for the pure kernels — adopting
the test kind the reference lacks (SURVEY.md §5 'Property-based: none')
for the invariants that must hold on ANY input, not just fixtures."""

from __future__ import annotations

import json

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# JSON extraction chain


@given(
    payload=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=8),
        st.one_of(st.integers(-1000, 1000), st.text(max_size=20), st.booleans()),
        min_size=1,
        max_size=5,
    ),
    prefix=st.text(max_size=40),
    suffix=st.text(max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_json_extraction_finds_embedded_object(payload, prefix, suffix):
    from file_analyzer_ray.functions.json_extract import extract_json_from_text

    # Avoid the prefix/suffix accidentally containing braces that form
    # larger candidate objects around the payload.
    prefix = prefix.replace("{", "").replace("}", "")
    suffix = suffix.replace("{", "").replace("}", "")
    text = prefix + json.dumps(payload) + suffix
    got = extract_json_from_text(text)
    assert got == payload


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_json_extraction_never_raises(text):
    from file_analyzer_ray.functions.json_extract import extract_json_from_text

    got = extract_json_from_text(text)
    assert got is None or isinstance(got, dict)


# ---------------------------------------------------------------------------
# hashing invariants


@given(st.text(min_size=0, max_size=500))
@settings(max_examples=100, deadline=None)
def test_char_shingle_hashes_match_string_shingles_cardinality(text):
    from file_analyzer_ray.functions.hashing import char_shingle_hashes
    from file_analyzer_ray.functions.text import char_shingles

    hashes = char_shingle_hashes(text, 5)
    strings = char_shingles(text, 5)
    assert len(hashes) == len(strings)
    # distinct shingles → distinct-ish hashes (31-bit space, ≤500 items:
    # collisions astronomically unlikely; equality of sets of counts)
    assert len(np.unique(hashes)) == len(set(strings))


@given(
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200),
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200),
)
@settings(max_examples=50, deadline=None)
def test_hll_merge_commutes(a, b):
    from file_analyzer_ray.stages.sketches import hll_registers

    ra = hll_registers(np.array(a, dtype=np.uint64), 8)
    rb = hll_registers(np.array(b, dtype=np.uint64), 8)
    both = hll_registers(np.array(a + b, dtype=np.uint64), 8)
    assert (np.maximum(ra, rb) == both).all()


@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
@settings(max_examples=200, deadline=None)
def test_simhash_banding_pigeonhole(h1, h2):
    """Hamming ≤ 3 ⇒ at least one of the 4 16-bit bands is identical."""
    from file_analyzer_ray.functions.hashing import hamming64, phash_bands

    if hamming64(h1, h2) <= 3:
        b1, b2 = phash_bands(h1, 4, 16), phash_bands(h2, 4, 16)
        assert any(x == y for x, y in zip(b1, b2))


@given(st.binary(min_size=0, max_size=2000))
@settings(max_examples=100, deadline=None)
def test_phash_small_perturbation_small_hamming(payload):
    from file_analyzer_ray.functions.hashing import hamming64, phash64

    if len(payload) < 128:
        return
    perturbed = bytearray(payload)
    perturbed[-1] = (perturbed[-1] + 1) % 256
    d = hamming64(phash64(payload), phash64(bytes(perturbed)))
    assert d <= 4  # one byte moves at most a couple of bucket means


# ---------------------------------------------------------------------------
# tag / filename rules


@given(st.lists(st.text(alphabet="abcdefgh XYZ", max_size=12), max_size=20))
@settings(max_examples=100, deadline=None)
def test_clean_tags_invariants(tags):
    from file_analyzer_ray.functions.signatures import GENERIC_TAGS
    from file_analyzer_ray.functions.tags import clean_tags

    out = clean_tags(tags)
    assert len(out) <= 10
    assert all(t == t.lower() and len(t) > 2 for t in out)
    assert not (set(out) & GENERIC_TAGS)
    assert len(out) == len(set(out))  # deduped


@given(st.text(max_size=120))
@settings(max_examples=100, deadline=None)
def test_suggest_filename_always_valid(description):
    from file_analyzer_ray.functions.tags import suggest_filename

    name = suggest_filename(None, description, "")
    assert name
    assert not set(name) & set('\\/*?:"<>| ')
