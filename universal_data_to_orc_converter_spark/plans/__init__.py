"""Plan inspection — helpers for asserting physical-plan properties
(pushdown, broadcast, codegen) in tests and for eyeballing plans while
tuning. See plans/inspect.py."""
