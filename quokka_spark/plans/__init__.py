"""quokka_spark.plans — physical-layout and skew tooling."""
