from bids_spark.plans.parser import parse_query, Term, Phrase, Bool  # noqa: F401
from bids_spark.plans.planner import SearchEngine  # noqa: F401
