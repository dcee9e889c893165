"""quokka_spark.operators"""
