from rdfrules_spark.mining.amie import MiningParams, mine  # noqa: F401
