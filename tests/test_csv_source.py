"""CSV reader-option tests (reference O1): delimiter, quote-escape
mode, header, all-String default schema, and DROPMALFORMED."""

from __future__ import annotations

from pyspark.sql import types as T

from hdfs_parquet_importer_spark.etl.csv_source import read_csv


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_custom_delimiter(spark, tmp_path):
    path = _write(tmp_path, "semi.csv", "a;b\n1;x\n2;y\n")
    df = read_csv(spark, path, delimiter=";")
    assert df.columns == ["a", "b"]
    assert {(r.a, r.b) for r in df.collect()} == {("1", "x"), ("2", "y")}


def test_default_schema_is_all_string(spark, tmp_path):
    # Without a schema the reference never enables inference, so every
    # column is String (SURVEY §1.2 "inference" note).
    path = _write(tmp_path, "s.csv", "a,b\n1,2.5\n")
    df = read_csv(spark, path)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]


def test_infer_schema_extension(spark, tmp_path):
    path = _write(tmp_path, "i.csv", "a,b\n1,2.5\n")
    df = read_csv(spark, path, infer_schema=True)
    types = [f.dataType.simpleString() for f in df.schema.fields]
    assert types == ["int", "double"]


def test_slash_escape_mode(spark, tmp_path):
    # With slash_escapes, \" inside a quoted field escapes the quote.
    path = _write(tmp_path, "e.csv", 'a,b\n1,"he said \\"hi\\""\n')
    df = read_csv(spark, path, slash_escapes=True)
    rows = df.collect()
    assert rows[0].b == 'he said "hi"'
    # Default mode: "" is the escape (RFC 4180 doubling).
    path2 = _write(tmp_path, "e2.csv", 'a,b\n1,"he said ""hi"""\n')
    df2 = read_csv(spark, path2, slash_escapes=False)
    assert df2.collect()[0].b == 'he said "hi"'


def test_dropmalformed_with_explicit_schema(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.DoubleType()),
        ]
    )
    path = _write(tmp_path, "m.csv", "a,b\n1,2.5\nnot_a_number,3.5\n2,4.5\n")
    df = read_csv(spark, path, schema=schema)
    got = {(r.a, r.b) for r in df.collect()}
    assert got == {(1, 2.5), (2, 4.5)}  # malformed row dropped
