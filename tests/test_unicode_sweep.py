"""Round-8 unicode/multibyte sweep: every documents-only oracled query
against planted non-ASCII text.

The driver corpus is pure ASCII, so JVM-vs-utf8proc string semantics
were an unswept class. The planted fixture mixes Latin accents, German
ss-eszett, Turkish dotted/dotless I, CJK (with and without spaces),
astral-plane emoji (surrogate pairs), ZWJ sequences, combining marks,
NBSP, embedded tab/newline/C0 controls, RTL scripts, non-ASCII digits,
ligatures, and an emoji-only doc — each duplicated once so dedup paths
see unicode duplicate pairs. First run found THREE real divergences:

- ``text_char_entropy`` (and pipeline_web_ingest's shared expression)
  measured c_alpha as length(text) minus a translate over LOWER(text)
  — but full Unicode lowercasing can change the LENGTH (JVM lower('İ')
  is i + U+0307, two codepoints), undercounting letters by the
  expansion delta. Both sides now measure against length(lower(text)).
- ``text_normalize``: İ is Unicode's only one-to-many LOWERCASE
  special casing; the JVM applies it in full, DuckDB's utf8proc maps
  one-to-one. The oracle now pre-substitutes the full expansion.
- ``source_text_lines`` assumed documents contain no newlines; the
  oracle now states true line semantics (split on \\n | \\r\\n | \\r),
  matching Hadoop's line reader.

One CONTRACT exception: ``multimodal_decode``'s stub features are
BYTE-stride statistics over the UTF-8 payload (the honest semantics
for opaque media blobs), while its oracle reads codepoints — they
coincide exactly on ASCII (the driver corpus, where it is value-checked)
and legitimately diverge on multibyte text, so here it only has to RUN
(n_bytes stays octet-exact either way).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .oracle_compare import compare

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "caf\u00e9 na\u00efve co\u00f6perate r\u00e9sum\u00e9 fa\u00e7ade",
    "der wei\u00dfe Stra\u00dfenb\u00e4r gr\u00fc\u00dft die s\u00fc\u00dfe M\u00fcnze",
    "\u0130stanbul \u0131rmak \u0130\u011e\u0130\u0131 dotless and dotted",
    "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u306b\u306f"
    "\u7a7a\u767d\u304c\u3042\u308a\u307e\u305b\u3093",
    "\u4e2d\u6587 \u6587\u672c \u6709 \u7a7a\u683c \u5206\u8bcd",
    "\U0001F600 \U0001F603 \U0001F604 emoji astral plane \U0001D11E music",
    "\U0001F468\u200d\U0001F469\u200d\U0001F467 family zwj sequence "
    "\U0001F44D\U0001F3FD fitzpatrick",
    "e\u0301 combining acute vs \u00e9 precomposed",
    "nbsp\u00a0separated\u00a0words here",
    "tab\tand\nnewline inside text",
    "\u05e9\u05dc\u05d5\u05dd hebrew rtl text",
    "\u0645\u0631\u062d\u0628\u0627 arabic text",
    "digits \u0660\u0661\u0662\u0663 and \u096a\u096b\u096c mixed ascii 012",
    "ctrl\x01chars\x1fembedded\x07here",
    "\u2163\u2164\u2165 roman numerals \u00bd \u00be fractions",
    "\ufb01\ufb02 ligatures \ufb00 and \u0149 precomposed",
    "\U0001F600" * 10,
]

RUN_ONLY = {"multimodal_decode"}  # byte-vs-codepoint contract, see above


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("unicode_sf")
    rows = []
    for i, t in enumerate(DOCS):
        rows.append((i, t))
        rows.append((100 + i, t))  # unicode duplicate pairs for dedup
    langs = ["en", "de", "tr", "ja", "zh", "he", "ar", None]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(
                [langs[i % len(langs)] for i in range(len(rows))],
                pa.string(),
            ),
            "source": pa.array(
                ["web", "wiki"][: 2] * (len(rows) // 2), pa.string()
            ),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, f"{d}/documents.parquet")
    return str(d)


def test_documents_oracles_survive_unicode(spark, unicode_sf):
    from plc_data_etl_pipeline_spark.registry import all_queries

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{unicode_sf}/documents.parquet')"
    )
    bad, ran = [], 0
    try:
        for name, qd in all_queries().items():
            if qd.oracle is None:
                continue
            try:
                sdf = qd.fn(spark, unicode_sf)
                srows = [tuple(r) for r in sdf.collect()]
            except Exception:
                continue  # needs tables beyond documents
            if name in RUN_ONLY:
                assert len(srows) == 2 * len(DOCS)
                continue
            try:
                rel = con.sql(qd.oracle)
                problems = compare(
                    list(sdf.columns), srows,
                    [d[0] for d in rel.description], rel.fetchall(),
                )
            except Exception:
                continue  # oracle references other tables
            ran += 1
            if problems:
                bad.append(f"{name}: {problems[-1][:160]}")
    finally:
        con.close()
    assert ran >= 55, f"sweep shrank to {ran} queries — fixture drift?"
    assert not bad, "unicode divergence:\n" + "\n".join(bad)
