"""Query-family modules; import them for their registration side
effects via mapreduce_minhash_lsh_spark.registry (the public facade).
"""
