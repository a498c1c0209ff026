"""Pipeline orchestration: the reference's ADF/Synapse DAG as plain Python."""
