"""quokka_spark.functions"""
