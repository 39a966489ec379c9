SELECT sum(cast(l_quantity * 25264513 AS INT4)) AS s FROM lineitem WHERE l_quantity > 0;
