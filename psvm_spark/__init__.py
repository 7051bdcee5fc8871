"""psvm_spark — a PySpark-native analytics engine with the capabilities of
openbigdatagroup/psvm (distributed kernel SVM train/predict) plus the
mandated extension surface: relational/query operators, LLM-data-pipeline
operators (dedup, similarity search, multimodal, text analysis), and
Structured Streaming over the events table.

Architecture (see SURVEY.md):
  - DataFrame/SQL-first: declare logical plans, let Catalyst/Tungsten/AQE
    pick physical strategies. Zero custom Catalyst rules.
  - Kernel SVM re-expressed as Nystrom/RFF feature maps + MLlib LinearSVC
    (SURVEY.md section 2.1 A7/A10) instead of a port of the C++ ICF+IPM.
  - Every query operator is registered in psvm_spark.registry with a
    DuckDB oracle twin where SQL-expressible.
"""

__version__ = "0.1.0"
