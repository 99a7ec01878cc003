"""CSV source (reference O1, package.scala:110-115,127).

Reader options mirror the reference exactly, with one deliberate fix:
the reference's ``charset=UTF8`` spelling is rejected by modern Spark
(SURVEY.md §4.3) — we use ``UTF-8``.

At scale the CSV scan parallelizes by file split; DROPMALFORMED keeps
corrupt physical rows out without failing the job, matching the
reference's permissive-drop stance (package.scala:112).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    delimiter: str = ",",
    slash_escapes: bool = False,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """Read a CSV file/glob with the reference's reader contract.

    * ``header=True`` — first row names columns (package.scala:111);
    * ``mode=DROPMALFORMED`` — drop physically corrupt rows (:112);
    * UTF-8 charset (:113, spelling fixed per SURVEY §4.3);
    * quote-escape ``\\`` when ``slash_escapes`` else ``\"`` (:114-115);
    * explicit ``schema`` wins over inference; with neither, Spark
      defaults every column to String — the reference's actual
      "inferred" behavior (package.scala:121-123, SURVEY §1.2).
    ``infer_schema=True`` is an extension the reference documents but
    never enables.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", "DROPMALFORMED")
        .option("charset", "UTF-8")
        .option("delimiter", delimiter)
        .option("escape", "\\" if slash_escapes else '"')
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
