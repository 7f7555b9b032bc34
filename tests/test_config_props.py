"""Property-based tests (hypothesis) for the config layer — the
reference's observable parsing contract (SURVEY.md §1.3, §2.1 #3-5)
must hold for ALL inputs, not just the fixtures: last-wins duplicate
keys, whitespace tolerance, $var/#lit classification, map-file order
preservation."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hivetomysql_spark.config import DumpConf, DumpMap, parse_properties

# keys/values the java-properties subset can express on one line:
# printable ASCII (control chars \x1c-\x1f count as Python
# whitespace and are stripped); keys additionally carry no '=',
# no spaces, and no leading comment char
_key = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=126, exclude_characters="=#!"
    ),
    min_size=1,
    max_size=20,
)
_value = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=30,
).map(str.strip)


@given(st.dictionaries(_key, _value, max_size=8))
@settings(max_examples=200)
def test_parse_properties_roundtrip(d):
    text = "\n".join(f"{k}={v}" for k, v in d.items())
    assert parse_properties(text) == d


@given(st.dictionaries(_key, _value, min_size=1, max_size=5), _key, _value)
@settings(max_examples=100)
def test_parse_properties_last_wins(d, dup_key, second_val):
    lines = [f"{k}={v}" for k, v in d.items()]
    lines.append(f"{dup_key}=XFIRSTX")
    lines.append(f"{dup_key}={second_val}")
    parsed = parse_properties("\n".join(lines))
    assert parsed[dup_key] == second_val


# a map entry: (target, kind, payload) where kind picks the
# reference's three field classes (HiveToMysql.java:152-165)
_entry = st.tuples(
    _key,
    st.sampled_from(["rename", "var", "lit"]),
    st.text(
        alphabet=st.characters(
            min_codepoint=33, max_codepoint=126, exclude_characters="=#!$"
        ),
        min_size=1,
        max_size=15,
    ),
)


@given(st.lists(_entry, min_size=1, max_size=8, unique_by=lambda e: e[0]))
@settings(max_examples=200)
def test_dump_map_classification_and_order(entries):
    conf = DumpConf.from_text(
        "\n".join(f"{payload}=resolved_{payload}" for _, kind, payload in entries if kind == "var")
    )
    lines = []
    for target, kind, payload in entries:
        if kind == "rename":
            lines.append(f"{target}={payload}")
        elif kind == "var":
            lines.append(f"{target}=${payload}")
        else:
            lines.append(f"{target}=#{payload}")
    m = DumpMap.from_text("\n".join(lines), conf=conf)
    # order preserved exactly (reference emits INSERT columns in map order)
    assert m.target_names == [t for t, _, _ in entries]
    for spec, (target, kind, payload) in zip(m.fields, entries):
        if kind == "rename":
            assert spec.source == payload and spec.constant is None
        elif kind == "var":
            assert spec.constant == f"resolved_{payload}"
        else:
            assert spec.constant == payload
