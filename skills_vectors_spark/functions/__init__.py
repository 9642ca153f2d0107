from skills_vectors_spark.functions.vector import cosine_sim, dot, l2_dist, l2_norm  # noqa: F401
