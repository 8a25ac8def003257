from lucenenet_spark.functions.smallfloat import (  # noqa: F401
    byte315_to_float,
    float_to_byte315,
    norm_byte_from_length,
    NORM_TABLE,
)
