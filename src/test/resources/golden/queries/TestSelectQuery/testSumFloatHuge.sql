SELECT sum(cast(l_extendedprice * 3.21506374375027E33 AS FLOAT8)) AS s FROM lineitem WHERE l_quantity > 0;
