import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from polars_numba_spark import get_spark
import polars_numba_spark.sql as sqlmod
from pyspark.sql.functions import udtf as _udtf
import functools

spark = get_spark(app_name='udtf-arrow-bench'); spark.sparkContext.setLogLevel('ERROR')
import __spark_entry__ as e
qs = e.queries()
SF = '/root/testdata/sf0.1'

def run(name, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        df = qs[name](spark, SF)
        df.write.format('noop').mode('overwrite').save()
        best = min(best, time.time()-t0)
    return best

# cold warmup
run('sql_surface_running_balance', 1)
row_scan = run('sql_surface_running_balance')
row_fold = run('sql_surface_capped_fold')

def arrow_udtf(returnType=None):
    return functools.partial(_udtf, returnType=returnType, useArrow=True)
sqlmod.udtf = arrow_udtf
run('sql_surface_running_balance', 1)
arrow_scan = run('sql_surface_running_balance')
arrow_fold = run('sql_surface_capped_fold')
print(f"row:   scan {row_scan:.2f}s  fold {row_fold:.2f}s")
print(f"arrow: scan {arrow_scan:.2f}s  fold {arrow_fold:.2f}s")
