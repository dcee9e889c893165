"""quokka_spark.streaming"""
