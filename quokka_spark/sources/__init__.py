"""quokka_spark.sources"""
