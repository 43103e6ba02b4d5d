"""Driver oracle queries for the workbook-plan operator families.

Each query derives a sheet-shaped input from the TPC-H fixture tables
(deterministic column expressions — no side data) and runs the REAL plan
operators (compound labels, SheetSpec emitters, W1+W2 question chain)
against a hand-written DuckDB twin.  The workbook-level fidelity gate is
tests/test_workbooks.py (reference execution parity); these queries prove
the same operators at driver scale with value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mhdb_tables2turtles_spark.functions import udfs
from mhdb_tables2turtles_spark.operators.compound import (
    Fragment,
    compound_columns,
)
from mhdb_tables2turtles_spark.plans.sheetspec import (
    CodeMap,
    ForeignKey,
    Literal,
    SheetSpec,
    sheet_triples,
)

__all__ = ["SHEET_QUERIES", "sheet_oracles"]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sql_pascal(x: str) -> str:
    # mirror of queries._sql_pascal (kept local to avoid an import cycle)
    return (
        f"list_aggregate(list_transform(string_split(lower({x}), ' '), "
        f"w -> upper(w[1])||lower(w[2:])), 'string_agg', '')"
    )


# ------------------------------------------------- F7/F10 compound labels


_COMPOUND_FRAGMENTS = (
    Fragment("icd9", "; ICD9CM:%s", " ICD9 %s", ":hasICD9Code", raw_prefix="ICD9CM:"),
    Fragment("severity", "; severity: %s", " severity %s", ":hasSeverity"),
)


def q_sheet_disorder_compound(spark, sf_dir) -> DataFrame:
    """Compound-label minting (disorders-sheet operator) over part:
    every present attribute extends both the display label and the
    subject-IRI seed, plus a side triple — one concat/when expression
    pair, broadcast dim join, row-local otherwise."""
    part = _read(spark, sf_dir, "part").select("p_partkey", "p_name")
    sev = _read(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("__sk"),
        F.col("r_name").alias("severity"),
    )
    base = part.withColumn(
        "icd9",
        F.when(
            F.col("p_partkey") % 3 == 0,
            (F.col("p_partkey") % 900 + 100).cast("string"),
        ),
    ).join(F.broadcast(sev), F.col("p_partkey") % 7 == F.col("__sk"), "left")
    label, subject = compound_columns(F.col("p_name"), _COMPOUND_FRAGMENTS)
    base = base.withColumn("__label", label).withColumn("__subject", subject)

    decl = base.select(
        F.col("__subject").alias("subject"),
        F.lit("a").alias("predicate"),
        F.lit(":Disorder").alias("object"),
    )
    lab = base.select(
        F.col("__subject").alias("subject"),
        F.lit("rdfs:label").alias("predicate"),
        udfs.lang_literal(F.col("__label")).alias("object"),
    )
    icd = base.filter(F.col("icd9").isNotNull()).select(
        F.col("__subject").alias("subject"),
        F.lit(":hasICD9Code").alias("predicate"),
        F.concat(F.lit("ICD9CM:"), F.col("icd9")).alias("object"),
    )
    sv = base.filter(F.col("severity").isNotNull()).select(
        F.col("__subject").alias("subject"),
        F.lit(":hasSeverity").alias("predicate"),
        udfs.iri(F.col("severity"), "PascalCase").alias("object"),
    )
    return decl.unionByName(lab).unionByName(icd).unionByName(sv)


_SQL_COMPOUND = f"""
    with base as (
        select p_partkey, p_name,
               case when p_partkey % 3 = 0
                    then cast(p_partkey % 900 + 100 as varchar) end as icd9,
               r.r_name as severity
        from part left join region r on p_partkey % 7 = r.r_regionkey
    ),
    lab as (
        select *,
          p_name || coalesce('; ICD9CM:'||icd9, '')
                 || coalesce('; severity: '||severity, '') as label,
          p_name || coalesce(' ICD9 '||icd9, '')
                 || coalesce(' severity '||severity, '') as seed
        from base
    ),
    subj as (select *, ':'||{_sql_pascal('seed')} as subject from lab)
    select subject, 'a' as predicate, ':Disorder' as object from subj
    union all
    select subject, 'rdfs:label', '"'||'"'||'"'||label||'"'||'"'||'"'||'@en' from subj
    union all
    select subject, ':hasICD9Code', 'ICD9CM:'||icd9 from subj where icd9 is not null
    union all
    select subject, ':hasSeverity', ':'||{_sql_pascal('severity')} from subj
    where severity is not null
"""


# --------------------------------------- W1+W2 assessment question chain

_QUOTED_OPT = r'[-+]?[0-9]+=".*?"'


def q_assessment_questions(spark, sf_dir) -> DataFrame:
    """The questions-sheet chain end-to-end: W1 per-questionnaire running
    counter mints ``{questionnaire}_Q{n}`` IRIs; W2 parses response
    options (comma or quoted-token form) into positional rdf:Seq
    membership with option-text literals."""
    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = (
        ev.withColumn("qnum", F.row_number().over(w))
        .withColumn(
            "subject",
            F.format_string(":u%s_Q%s", F.col("user_id"), F.col("qnum")),
        )
        .withColumn("qn_iri", F.format_string(":u%s", F.col("user_id")))
        .withColumn("oiri", F.concat(F.col("subject"), F.lit("_Options")))
        .withColumn(
            "ro",
            F.when(
                F.col("event_id") % 2 == 0, F.lit("0=Never, 1=Sometimes")
            ).otherwise(F.lit('1="Very often", 2=Rarely')),
        )
        # six union branches read this subplan; without materialization
        # Spark re-executes the window per branch
        .localCheckpoint(eager=False)
    )
    opts = q.select(
        "subject",
        "oiri",
        F.posexplode(
            F.when(
                F.col("ro").contains('"'),
                F.regexp_extract_all("ro", F.lit(_QUOTED_OPT), 0),
            ).otherwise(F.split("ro", ","))
        ).alias("pos", "opt"),
    ).withColumn(
        "resp", F.trim(F.split("opt", "=").getItem(1))
    ).localCheckpoint(eager=False)  # read by 2 branches
    resp_iri = udfs.iri(F.col("resp"), "delimited")

    def tri(df, s, p, o):
        return df.select(s.alias("subject"), p.alias("predicate"), o.alias("object"))

    return (
        tri(q, F.col("subject"), F.lit("a"), F.lit(":Question"))
        .unionByName(tri(q, F.col("subject"), F.lit(":isReferencedBy"), F.col("qn_iri")))
        .unionByName(tri(q, F.col("subject"), F.lit(":hasResponseOptions"), F.col("oiri")))
        .unionByName(tri(q, F.col("oiri"), F.lit("a"), F.lit("rdf:Seq")))
        .unionByName(
            tri(
                opts,
                F.col("oiri"),
                F.format_string("rdf:_%s", F.col("pos") + 1),
                resp_iri,
            )
        )
        .unionByName(
            tri(
                opts,
                resp_iri,
                F.lit(":hasResponseOptionText"),
                udfs.lang_literal(F.col("resp")),
            )
        )
    )


# the quoted-response literal reproduces the reference's two-step escape:
# '"' -> backslash-quote (normalize) then '"' -> "'" leaves a literal
# backslash-apostrophe; chr(92) is the backslash (keeps this Python
# triple-quoted source free of escape soup)
_SQL_QUESTIONS = """
    with ev as (
        select event_id, user_id,
               row_number() over (partition by user_id order by ts, event_id) as qnum,
               case when event_id % 2 = 0 then '0=Never, 1=Sometimes'
                    else '1="Very often", 2=Rarely' end as ro
        from events
    ),
    q as (
        select ':u'||user_id||'_Q'||qnum as subject,
               ':u'||user_id as qn_iri,
               ':u'||user_id||'_Q'||qnum||'_Options' as oiri,
               ro
        from ev
    ),
    opt as (
        select subject, oiri,
               case when contains(ro, '"')
                    then regexp_extract_all(ro, '[-+]?[0-9]+=".*?"')
                    else string_split(ro, ',') end as opts
        from q
    ),
    ox as (
        select subject, oiri, i as pos,
               trim(string_split(opts[i], '=')[2]) as resp
        from opt, unnest(generate_series(1, len(opts))) u(i)
    )
    select subject, 'a' as predicate, ':Question' as object from q
    union all select subject, ':isReferencedBy', qn_iri from q
    union all select subject, ':hasResponseOptions', oiri from q
    union all select oiri, 'a', 'rdf:Seq' from q
    union all select oiri, 'rdf:_'||pos, ':'||replace(trim(resp, '"'), ' ', '_') from ox
    union all select ':'||replace(trim(resp, '"'), ' ', '_'), ':hasResponseOptionText',
        case when resp like '"%'
             then repeat('"', 3)||chr(92)||''''||trim(resp, '"')
                  ||chr(92)||''''||repeat('"', 3)||'@en'
             else repeat('"', 3)||resp||repeat('"', 3)||'@en' end
    from ox
"""


# ------------------------- SheetSpec emitters: defaults/aliases/codes/reverse

_SENSOR_SPEC = SheetSpec(
    table="sensors",
    subject_column="sensor",
    emitters=(
        ForeignKey("indices_area", "areas", "area", "rdfs:subClassOf",
                   default=":SensingDevice"),
        Literal("aliases", "rdfs:label", split=True),
        CodeMap("gcode", ":isAbout", ((1, ":Female"), (2, ":Male")),
                default=":Unspecified"),
        ForeignKey("rev_idx", "areas", "area", ":hasMemberNation",
                   reverse=True),
    ),
)


def q_sheet_sensor_fallback(spark, sf_dir) -> DataFrame:
    """SheetSpec emitter coverage through the real compiler: FK with
    constant fallback, comma-split alias labels, int-code mapping, and
    reversed FK emission — over a nation-derived sensors sheet."""
    nation = _read(spark, sf_dir, "nation")
    sensors = nation.select(
        F.col("n_nationkey").cast("long").alias("row_id"),
        F.col("n_name").alias("sensor"),
        F.when(
            F.col("n_nationkey") % 3 != 0, F.col("n_regionkey").cast("string")
        ).alias("indices_area"),
        F.when(
            F.col("n_nationkey") % 4 == 0,
            F.concat_ws(
                ", ",
                F.concat(F.lower("n_name"), F.lit(" alias")),
                F.concat(F.lower("n_name"), F.lit(" device")),
            ),
        ).alias("aliases"),
        (F.col("n_nationkey") % 3).cast("string").alias("gcode"),
        (F.col("n_nationkey") % 5).cast("string").alias("rev_idx"),
    )
    areas = _read(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("long").alias("index"),
        F.col("r_name").alias("area"),
    )
    t = sheet_triples({"sensors": sensors, "areas": areas}, _SENSOR_SPEC, 0)
    return t.select("subject", "predicate", "object")


_SQL_SENSORS = f"""
    with s as (
        select n_nationkey as k, n_name,
               ':'||{_sql_pascal('n_name')} as subject,
               case when n_nationkey % 3 != 0 then n_regionkey end as area_fk,
               n_nationkey % 3 as gcode,
               n_nationkey % 5 as rev_idx
        from nation
    )
    select subject, 'rdfs:label' as predicate, '"'||'"'||'"'||n_name||'"'||'"'||'"'||'@en' as object from s
    union all
    select subject, 'rdfs:subClassOf', ':SensingDevice' from s where area_fk is null
    union all
    select subject, 'rdfs:subClassOf', ':'||{_sql_pascal('r.r_name')}
    from s join region r on s.area_fk = r.r_regionkey
    union all
    select subject, 'rdfs:label', '"'||'"'||'"'||lower(n_name)||' alias'||'"'||'"'||'"'||'@en'
    from s where k % 4 = 0
    union all
    select subject, 'rdfs:label', '"'||'"'||'"'||lower(n_name)||' device'||'"'||'"'||'"'||'@en'
    from s where k % 4 = 0
    union all
    select subject, ':isAbout',
           case gcode when 1 then ':Female' when 2 then ':Male'
                      else ':Unspecified' end
    from s
    union all
    select ':'||{_sql_pascal('r.r_name')}, ':hasMemberNation', subject
    from s join region r on s.rev_idx = r.r_regionkey
"""


SHEET_QUERIES = {
    "sheet_disorder_compound": q_sheet_disorder_compound,
    "assessment_questions": q_assessment_questions,
    "sheet_sensor_fallback": q_sheet_sensor_fallback,
}


def sheet_oracles() -> dict[str, str]:
    return {
        "sheet_disorder_compound": _SQL_COMPOUND,
        "assessment_questions": _SQL_QUESTIONS,
        "sheet_sensor_fallback": _SQL_SENSORS,
    }
