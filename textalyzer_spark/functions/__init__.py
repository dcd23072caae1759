"""Scalar function layer: JVM-side column expressions where possible,
Arrow-batched pandas UDFs where the JVM cannot express the semantics."""

from textalyzer_spark.functions.tokenize import (  # noqa: F401
    tokenize_pandas,
    tokens_col,
    tokens_udf,
)
from textalyzer_spark.functions.width import display_width_udf, str_display_width  # noqa: F401
from textalyzer_spark.functions.syllables import syllables_col, count_syllables  # noqa: F401
