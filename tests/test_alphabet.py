"""Unit tests mirroring the reference's aligned_base_test.cpp coverage."""

import numpy as np
import pytest

from sina_tpu import alphabet as al


def test_encode_simple():
    pos, masks, width = al.encode("AGCU")
    assert width == 4
    assert pos.tolist() == [0, 1, 2, 3]
    assert masks.tolist() == [al.M_A, al.M_G, al.M_C, al.M_TU]


def test_encode_gaps_and_whitespace():
    pos, masks, width = al.encode("-A G\n.C-")
    assert width == 6
    assert pos.tolist() == [1, 2, 4]
    assert al.to_chars(masks) == "AGC"


def test_t_equals_u():
    _, m1, _ = al.encode("T")
    _, m2, _ = al.encode("U")
    assert m1.tolist() == m2.tolist()
    assert al.to_chars(m1) == "U"
    assert al.to_chars(m1, dna=True) == "T"


def test_lowercase_roundtrip():
    pos, masks, width = al.encode("aGcU")
    assert al.to_chars(masks) == "aGcU"
    assert (masks[0] & al.M_LC) != 0


def test_ambiguity_codes_roundtrip():
    for ch in "RYKMSWBDHVN":
        _, m, _ = al.encode(ch)
        assert al.to_chars(m) == ch
        assert al.AMBIG_ORDER[m[0]] > 1


def test_bad_character():
    with pytest.raises(al.BadCharacterError):
        al.encode("AC!G")


def test_complement():
    _, m, _ = al.encode("AGCU")
    comp = al.COMPLEMENT[m]
    assert al.to_chars(comp) == "UCGA"
    # R (AG) -> Y (UC)
    _, m, _ = al.encode("R")
    assert al.to_chars(al.COMPLEMENT[m]) == "Y"
    # lowercase preserved
    _, m, _ = al.encode("a")
    assert al.to_chars(al.COMPLEMENT[m]) == "u"


def test_comparisons():
    _, a, _ = al.encode("A")
    _, n, _ = al.encode("N")
    _, g, _ = al.encode("G")
    assert al.comp_optimistic(a, n)[0]
    assert not al.comp_optimistic(a, g)[0]
    assert not al.comp_pessimistic(n, n)[0]  # ambig never matches
    assert al.comp_pessimistic(a, a)[0]
    assert al.comp_exact(n, n)[0]
    assert not al.comp_exact(a, n)[0]
    # case-insensitive exact
    _, alc, _ = al.encode("a")
    assert al.comp_exact(a, alc)[0]


def test_decode_dots():
    pos, masks, width = al.encode("--AG-C--")
    assert al.decode(pos, masks, width) == "..AG-C.."
    assert al.decode(pos, masks, width, dots=False) == "--AG-C--"
