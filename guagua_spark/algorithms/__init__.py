"""Library algorithms re-expressing the reference's example workloads
(guagua-examples): sum, linear regression, logistic regression, k-means,
neural network — each as (MasterComputable, WorkerComputable) pairs over
the IterativeEngine, or as pure-DataFrame formulations where those are
the better Spark idiom.
"""

from guagua_spark.algorithms.sum_ import SumMaster, SumState, SumWorker

__all__ = ["SumMaster", "SumState", "SumWorker"]
