from . import hash_ops, filter_ops, agg_ops, sort_ops, join_ops
