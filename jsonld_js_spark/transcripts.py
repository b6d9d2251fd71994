"""Deterministic synthetic transcript table (BASELINE.json input_hint):
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp).

Seedless pure-integer arithmetic so the SAME rows are producible in
Spark SQL and in DuckDB (the correctness oracle): every expression is
written once in portable SQL text, with the few dialect-divergent
constructs (range/explode, interval arithmetic, regex literals)
substituted per dialect. FIXTURES.md §1 contract:

- conv_id "conv-{i:06d}"
- hot conversations: every 97th conv has 500 turns (vs median ~10)
  — the conversation-skew knob
- roles cycle user/assistant/tool; tool turns carry "tool-{k}"
- text embeds 1-3 "[[Entity{k}]]" mentions whose ids follow a
  product distribution (skewed toward small k — the hot-entity knob);
  ~20% of mentions use the lowercase surface form "[[entity{k}]]"
  (exercises entity canonicalization)
- ts = 2026-01-01T00:00:00Z + i hours*... deterministic, no wall clock
"""
from __future__ import annotations

import os
import re


def n_conv_for_sf(sf: float) -> int:
    return max(20, int(round(100000 * sf)))


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else 0.01


# ---------------------------------------------------------------------------
# dialect snippets
def _d(dialect: str) -> dict:
    if dialect == "spark":
        return {
            "gen_conv": "SELECT id AS i FROM range({n_conv})",
            "explode_turns":
                "SELECT i, n_turns, explode(sequence(0, n_turns - 1)) AS t "
                "FROM conv",
            "ts_expr": "timestamp'2026-01-01 00:00:00' + "
                       "make_interval(0, 0, 0, 0, 0, 0, i * 3600 + t)",
        }
    if dialect == "duckdb":
        return {
            "gen_conv": "SELECT range AS i FROM range({n_conv})",
            "explode_turns":
                "SELECT i, n_turns, unnest(range(n_turns)) AS t FROM conv",
            "ts_expr": "TIMESTAMP '2026-01-01 00:00:00' + "
                       "to_seconds(i * 3600 + t)",
        }
    raise ValueError(dialect)


# Entity-id expression for mention slot j: product of two uniform-ish
# residues, floor-divided — skews mass toward small ids (hot entities).
def _ent(j: int) -> str:
    return (f"cast(floor((((i*31 + t*17 + {j}*29) % 50) * "
            f"((i*13 + t*7 + {j}*3) % 50)) / 50.0) as int)")


def _surface(j: int) -> str:
    return (f"(case when (i + t + {j}) % 5 = 0 then 'entity' "
            f"else 'Entity' end || cast(e{j} as string))")


def transcripts_sql(n_conv: int, dialect: str) -> str:
    """Full SELECT producing the transcript table, one row per turn."""
    d = _d(dialect)
    return f"""
WITH conv AS (
  SELECT i,
         cast(case when i % 97 = 0 then 500 else 6 + (i % 9) end as int)
           AS n_turns
  FROM ({d['gen_conv'].format(n_conv=n_conv)})
),
turns AS (
  {d['explode_turns']}
),
row0 AS (
  SELECT i, t,
         {_ent(0)} AS e0, {_ent(1)} AS e1, {_ent(2)} AS e2,
         cast(1 + ((i*7 + t*13) % 3) as int) AS m
  FROM turns
)
SELECT
  'conv-' || lpad(cast(i as string), 6, '0') AS conv_id,
  cast(t as int) AS turn_idx,
  case when t % 3 = 0 then 'user'
       when t % 3 = 1 then 'assistant'
       else 'tool' end AS role,
  'Turn ' || cast(t as string) || ' of conversation '
    || lpad(cast(i as string), 6, '0')
    || ': discussing [[' || {_surface(0)} || ']]'
    || case when m > 1 then ' and [[' || {_surface(1)} || ']]' else '' end
    || case when m > 2 then ' plus [[' || {_surface(2)} || ']]' else '' end
    || case when t % 3 = 2
            then ' via tool-' || cast((i + t) % 7 as string) else '' end
    || '.' AS text,
  case when t % 3 = 2 then 'tool-' || cast((i + t) % 7 as string)
       else null end AS tool,
  {d['ts_expr']} AS ts
FROM row0
"""


def transcripts_df(spark, sf: float | None = None,
                   n_conv: int | None = None,
                   sf_dir: str | None = None):
    """Spark DataFrame of synthesized transcripts. At real scale this is
    `spark.read.table('transcripts')` over Iceberg; the generator stands
    in for it here (sandbox has no external data).
    """
    if n_conv is None:
        if sf is None:
            sf = sf_from_dir(sf_dir or os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        n_conv = n_conv_for_sf(sf)
    return spark.sql(transcripts_sql(n_conv, "spark"))


def transcripts_cte(n_conv: int, dialect: str) -> str:
    """`transcripts AS (...)` CTE body for embedding in oracle SQL."""
    return transcripts_sql(n_conv, dialect)
