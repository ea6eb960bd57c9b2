"""find_substrings golden cases (ported from
/root/reference/spacy_llm/tests/tasks/test_ner.py:296-328)."""

import pytest

from spacy_llm_ray.parsing import find_substrings, unique


@pytest.mark.parametrize(
    "text,input_strings,result_strings,result_offsets",
    [
        (
            "Felipe and Jaime went to the library.",
            ["Felipe", "Jaime", "library"],
            ["Felipe", "Jaime", "library"],
            [(0, 6), (11, 16), (29, 36)],
        ),
        (
            "The Manila Observatory was founded in 1865 in Manila.",
            ["Manila", "The Manila Observatory"],
            ["Manila", "Manila", "The Manila Observatory"],
            [(4, 10), (46, 52), (0, 22)],
        ),
        (
            "Take the road from downtown and turn left at the public market.",
            ["public market", "downtown"],
            ["public market", "downtown"],
            [(49, 62), (19, 27)],
        ),
    ],
)
def test_offsets_correspond_to_substrings(text, input_strings, result_strings, result_offsets):
    offsets = find_substrings(text, input_strings)
    assert result_offsets == offsets
    assert result_strings == [text[s:e] for s, e in offsets]


def test_single_match_and_cursor():
    text = "ab ab ab"
    assert find_substrings(text, ["ab"], single_match=True) == [(0, 2)]
    assert find_substrings(text, ["ab"]) == [(0, 2), (3, 5), (6, 8)]
    assert find_substrings(text, ["ab"], find_after=1, single_match=True) == [(3, 5)]


def test_case_folding_and_empty():
    assert find_substrings("Hello hello", ["hello"]) == [(0, 5), (6, 11)]
    assert find_substrings("Hello hello", ["hello"], case_sensitive=True) == [(6, 11)]
    assert find_substrings("xyz", ["", "x"]) == [(0, 1)]


def test_unique_preserves_order():
    assert unique(["b", "a", "b", "c", "a"]) == ["b", "a", "c"]
