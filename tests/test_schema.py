"""Unit tests for the name=Type schema parser (reference package.scala:20-37)."""

import pytest
from pyspark.sql import types as T

from hdfs_parquet_importer_spark.schema import (
    SchemaParseError,
    parse_schema_text,
)


def test_six_types_and_order():
    text = """
# comment
a=String
b=Long
c=Int
d=Double
e=Float
f=Boolean
"""
    st = parse_schema_text(text)
    assert [f.name for f in st.fields] == ["a", "b", "c", "d", "e", "f"]
    assert [f.dataType for f in st.fields] == [
        T.StringType(), T.LongType(), T.IntegerType(),
        T.DoubleType(), T.FloatType(), T.BooleanType(),
    ]
    assert all(f.nullable for f in st.fields)


def test_trimming_and_comments_and_blanks():
    st = parse_schema_text("  name  =  String  \n\n# skip me\nx=Int\n")
    assert [(f.name, f.dataType) for f in st.fields] == [
        ("name", T.StringType()), ("x", T.IntegerType()),
    ]


def test_unsupported_type_raises():
    # Reference deliberately MatchErrors on unknown tokens (package.scala:33-34).
    with pytest.raises(SchemaParseError, match="unsupported type 'Timestamp'"):
        parse_schema_text("ts=Timestamp")


def test_malformed_line_raises():
    with pytest.raises(SchemaParseError, match="expected 'name=Type'"):
        parse_schema_text("just a line")
    with pytest.raises(SchemaParseError, match="empty column name"):
        parse_schema_text("=String")
