"""Library algorithms re-expressing the reference's example workloads
(guagua-examples): sum, linear regression, logistic regression, k-means,
neural network — each as (MasterComputable, WorkerComputable) pairs over
the IterativeEngine, or as pure-DataFrame formulations where those are
the better Spark idiom.
"""

from guagua_spark.algorithms.gradient import (
    GradientDescentMaster,
    GradientState,
    LinearGradientWorker,
    LogisticGradientWorker,
    ModelState,
)
from guagua_spark.algorithms.kmeans import (
    KMeansMaster,
    KMeansModel,
    KMeansWorker,
    kmeans_dataframe,
)
from guagua_spark.algorithms.nn import NNMaster, NNModel, NNWorker, OPTIMIZERS
from guagua_spark.algorithms.sum_ import SumMaster, SumState, SumWorker

__all__ = [
    "GradientDescentMaster",
    "GradientState",
    "LinearGradientWorker",
    "LogisticGradientWorker",
    "ModelState",
    "KMeansMaster",
    "KMeansModel",
    "KMeansWorker",
    "kmeans_dataframe",
    "NNMaster",
    "NNModel",
    "NNWorker",
    "OPTIMIZERS",
    "SumMaster",
    "SumState",
    "SumWorker",
]
