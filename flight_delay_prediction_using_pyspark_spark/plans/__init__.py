from flight_delay_prediction_using_pyspark_spark.plans.queries import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
