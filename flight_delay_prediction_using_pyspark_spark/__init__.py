"""spark-graft: a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of the reference `nethra060705/Flight-Delay-Prediction-Using-PySpark`
(see SURVEY.md), extended with LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) and designed for
multi-executor scale: declarative DataFrame plans, explicit schemas,
broadcast-hinted dim joins, AQE-enabled sessions, and no driver-side
row loops in any hot path.
"""

from flight_delay_prediction_using_pyspark_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
