"""JSON document source — the JsonDocumentParser analogue
(document/JsonDocumentParser.h:23-63): read JSON docs, flatten nested
objects with dot notation, map types per the reference's inference rules
(string→text, int→long, float→double, bool→string, null→skip,
object→dot-flatten, array→repeated values). Spark's from_json/read.json
does schema inference; we add the dot-flattening pass, which Catalyst
expresses as a flat projection (no UDF)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, BooleanType, StructType


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten struct columns into dotted top-level columns.

    Arrays are kept as arrays (reference: arrays become repeated field
    values — multi-value fields are ArrayType columns in our data model,
    SURVEY.md §1.1). Booleans become strings (JsonDocumentParser rule)."""
    cols = []

    def walk(prefix: str, schema: StructType, path: str):
        for f in schema.fields:
            name = f"{prefix}{f.name}"
            col_path = f"{path}`{f.name}`"
            if isinstance(f.dataType, StructType):
                walk(f"{name}{sep}", f.dataType, f"{col_path}.")
            elif isinstance(f.dataType, BooleanType):
                cols.append(F.expr(col_path).cast("string").alias(name))
            elif (isinstance(f.dataType, ArrayType)
                  and isinstance(f.dataType.elementType, BooleanType)):
                cols.append(F.expr(f"transform({col_path}, x -> cast(x as string))")
                            .alias(name))
            else:
                cols.append(F.expr(col_path).alias(name))

    walk("", df.schema, "")
    return df.select(*cols)


def read_json_documents(spark: SparkSession, path: str,
                        multiline: bool = False) -> DataFrame:
    """Read a JSON corpus and flatten it to the engine's flat-column data
    model. Dynamic schema accumulation (FieldInfosBuilder) is Spark's
    schema inference — free."""
    raw = spark.read.option("multiLine", multiline).json(path)
    return flatten(raw)
