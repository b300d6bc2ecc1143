"""End-to-end query callables over an ``sf_dir`` (the driver contract).

Every public function here takes ``sf_dir`` and returns a Dataset / pandas
DataFrame / pyarrow Table whose column names match the paired oracle SQL in
``__ray_entry__.oracle_sql`` exactly. Float columns that feed the driver's
value-hash comparison are rounded with ``functions.round_half_away`` on this
side and ``ROUND()`` on the SQL side.
"""

from . import embeddings_q, graph_queries, relational, text_q  # noqa: F401
