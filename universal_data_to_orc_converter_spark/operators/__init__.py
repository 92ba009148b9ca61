"""Operator modules. Importing a module registers its queries in
``universal_data_to_orc_converter_spark.registry``."""
