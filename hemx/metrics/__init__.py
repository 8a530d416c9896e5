from hemx.metrics.eigen import eigen_metrics, EigenAccumulator
