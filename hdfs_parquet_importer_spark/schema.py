"""``name=Type`` schema-file parser (reference package.scala:20-37).

Parses a plain-text schema description into a ``StructType``:

* one ``columnName=Type`` pair per line, both sides ``.trim``-ed
  (package.scala:25);
* ``#``-prefixed lines are comments (package.scala:23); blank lines are
  tolerated;
* exactly six primitive types (package.scala:27-32) — anything else
  raises, matching the reference's deliberate ``MatchError``
  (package.scala:33-34);
* field order is significant: it must match CSV column order
  (package.scala:16);
* every field is nullable, as the reference's ColumnName builders are.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The six supported tokens (package.scala:27-32).
_TYPE_MAP: dict[str, T.DataType] = {
    "String": T.StringType(),
    "Long": T.LongType(),
    "Int": T.IntegerType(),
    "Double": T.DoubleType(),
    "Float": T.FloatType(),
    "Boolean": T.BooleanType(),
}


class SchemaParseError(ValueError):
    """Raised on an unsupported type token or malformed line."""


def parse_schema_text(text: str) -> T.StructType:
    """Parse schema-file *contents* into a StructType."""
    fields: list[T.StructField] = []
    for lineno, raw in enumerate(text.splitlines(), start=1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if "=" not in line:
            raise SchemaParseError(f"line {lineno}: expected 'name=Type', got {raw!r}")
        name, _, type_token = line.partition("=")
        name = name.strip()
        type_token = type_token.strip()
        if not name:
            raise SchemaParseError(f"line {lineno}: empty column name in {raw!r}")
        try:
            dtype = _TYPE_MAP[type_token]
        except KeyError:
            raise SchemaParseError(
                f"line {lineno}: unsupported type {type_token!r} "
                f"(supported: {', '.join(_TYPE_MAP)})"
            ) from None
        fields.append(T.StructField(name, dtype, nullable=True))
    return T.StructType(fields)


def parse_schema_file(path: str) -> T.StructType:
    """Parse a schema file on the driver's local filesystem.

    Driver-side file IO exactly like the reference (package.scala:21
    reads with scala.io.Source); schema files are tiny config, never
    data, so this does not touch executors.
    """
    with open(path, encoding="utf-8") as fh:
        return parse_schema_text(fh.read())
