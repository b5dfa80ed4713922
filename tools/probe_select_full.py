#!/usr/bin/env python3
"""Dry-run probe for llm_select_full thresholds (CLAUDE.md: probe gate
thresholds before planting them in an oracle). Replays the full DSIR ->
tokenBudget -> unimax -> shuffleShards -> manifest pipeline in DuckDB at
all three scales and reports how non-trivially each stage splits."""
import sys
import duckdb

BUDGET = int(sys.argv[1]) if len(sys.argv) > 1 else 300
BBP = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
E = int(sys.argv[3]) if len(sys.argv) > 3 else 2
RPS = int(sys.argv[4]) if len(sys.argv) > 4 else 16


def l2(x):
    return (f"((length(bin({x})) - 1) * 1024 + "
            f"((({x}) * 1024 // (1::BIGINT << (length(bin({x})) - 1)))) - 1024)")


SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, source, text,
    list_filter(string_split(text, ' '), t -> len(t) > 0) AS tk
  FROM documents),
th AS (
  SELECT doc_id, lang, list_transform(tk, t ->
      list_reduce(list_transform(string_split(t, ''),
          c -> CAST(unicode(c) AS BIGINT)),
        (a, b) -> (a * 31 + b) % 2147483647)) AS hs
  FROM toks WHERE len(tk) > 0),
g AS (
  SELECT doc_id, lang,
    unnest(range(1, greatest(len(hs) - 1, 1) + 1)) AS pos, hs
  FROM th),
grams AS (
  SELECT doc_id, lang,
    list_reduce(hs[pos:least(pos + 1, len(hs))],
      (a, b) -> (a * 1000003 + b) % 2147483647) % 64 AS b
  FROM g),
dist AS (
  SELECT b, CAST(count(*) AS BIGINT) AS rc,
    CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS tc
  FROM grams GROUP BY b),
tot AS (
  SELECT CAST(sum(rc) AS BIGINT) AS r, CAST(sum(tc) AS BIGINT) AS t,
    CAST(count(*) AS BIGINT) AS nb
  FROM dist),
lw AS (
  SELECT b, ({l2('tc + 1')} - {l2('t + nb')})
           - ({l2('rc + 1')} - {l2('r + nb')}) AS w
  FROM dist, tot),
sc AS (
  SELECT doc_id, CAST(sum(w) AS BIGINT) * 1024 // count(*) AS dsir_score
  FROM grams JOIN lw USING (b) GROUP BY doc_id),
sq AS (SELECT doc_id, dsir_score, dsir_score // 1024 AS s FROM sc),
hist AS (SELECT s, count(*) AS c FROM sq GROUP BY s),
cdf AS (SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM hist),
n AS (SELECT max(cum) AS n FROM cdf),
cut AS (
  SELECT min(s) AS cut FROM cdf, n
  WHERE cum >= (n * 6000 + 9999) // 10000),
keptd AS (
  SELECT t.doc_id, t.source, t.lang, t.text
  FROM toks t JOIN sq USING (doc_id), cut WHERE sq.s >= cut.cut),
tb AS (
  SELECT doc_id, source, lang, text,
    CAST(len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
    ((doc_id % 999999937) * 654435887) % 999999937 AS h
  FROM keptd),
cw AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS strt
  FROM tb),
bud AS (SELECT doc_id, lang, text, n_tokens, h FROM cw WHERE strt < {BUDGET}),
s2 AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tok FROM bud GROUP BY lang),
tt2 AS (
  SELECT CAST(sum(tok) * {BBP} // 10000 AS BIGINT) AS bdg,
    CAST(count(*) AS BIGINT) AS ns
  FROM s2),
r2 AS (
  SELECT lang, tok, tok * {E} AS cap,
    CAST(row_number() OVER (ORDER BY tok * {E}, lang) AS BIGINT) AS i,
    coalesce(sum(tok * {E}) OVER (ORDER BY tok * {E}, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM s2),
sh2 AS (
  SELECT r2.*, (bdg - pre) // (ns - i + 1) AS share,
    cap <= (bdg - pre) // (ns - i + 1) AS exh
  FROM r2, tt2),
star AS (SELECT coalesce(arg_min(share, i) FILTER (NOT exh), 0) AS st FROM sh2),
plan AS (
  SELECT lang, tok, exh,
    CASE WHEN exh THEN cap ELSE st END AS alloc
  FROM sh2, star),
plan2 AS (
  SELECT lang, exh,
    CASE WHEN tok > 0 THEN alloc // tok ELSE 0 END AS fullep,
    alloc - (CASE WHEN tok > 0 THEN alloc // tok ELSE 0 END) * tok AS part
  FROM plan),
cb AS (
  SELECT doc_id, lang, text, n_tokens,
    sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS strt
  FROM bud),
a2 AS (
  SELECT cb.doc_id, cb.lang, cb.text, cb.n_tokens,
    CAST(p.fullep + (CASE WHEN cb.strt < p.part THEN 1 ELSE 0 END) AS BIGINT) AS napp
  FROM cb JOIN plan2 p USING (lang)),
ep AS (
  SELECT doc_id, lang, text, n_tokens,
    CAST(unnest(range(0, napp)) AS BIGINT) AS epoch
  FROM a2 WHERE napp > 0),
rid AS (SELECT *, doc_id * {E} + epoch AS rid FROM ep),
hh AS (SELECT *, ((rid % 999999937) * 654435887) % 999999937 AS hh FROM rid),
p AS (SELECT *, row_number() OVER (ORDER BY hh, rid) - 1 AS pos FROM hh),
shl AS (
  SELECT *, CAST(pos // {RPS} AS BIGINT) AS shard_id,
    CAST(pos - (pos // {RPS}) * {RPS} AS BIGINT) AS pis
  FROM p)
"""


def main():
    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf{sf}/documents.parquet')")
        total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
        kept = con.execute(SQL + "SELECT count(*) FROM keptd").fetchone()[0]
        bud = con.execute(SQL + "SELECT count(*) FROM bud").fetchone()[0]
        plan = con.execute(
            SQL + "SELECT lang, exh, fullep, part FROM plan2 "
                  "JOIN (SELECT lang, tok FROM s2) USING (lang) "
                  "ORDER BY lang").fetchall()
        eprows = con.execute(SQL + "SELECT count(*), max(epoch) FROM ep").fetchone()
        shards = con.execute(
            SQL + "SELECT count(DISTINCT shard_id), count(*) FROM shl").fetchone()
        print(f"sf{sf}: docs={total} dsir_kept={kept} budgeted={bud} "
              f"ep_rows={eprows[0]} max_epoch={eprows[1]} "
              f"shards={shards[0]}")
        print(f"  unimax plan: {plan}")
        con.close()


if __name__ == "__main__":
    main()
