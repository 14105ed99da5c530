select count(*) as n_docs,
       sum(case when is_outlier then 1 else 0 end) as n_length_outliers,
       floor(avg(entropy_bits) * 1000000.0 + 0.5) / 1000000.0
         as mean_entropy_bits,
       min(entropy_bits) as min_entropy_bits
from {{ sig }}
