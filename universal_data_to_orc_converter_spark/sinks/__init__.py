"""Sinks. The reference's single output format is ORC
(data_to_orc_converter.sh:245); see sinks/orc.py."""
