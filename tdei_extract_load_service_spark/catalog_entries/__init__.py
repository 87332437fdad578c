"""Per-family catalog entry modules (round-8 split of catalog.py).

Import order is defined by catalog.py's hub import block — do not import
these modules directly; go through ``tdei_extract_load_service_spark.catalog``.
"""
