SELECT c_custkey, c_name FROM customer WHERE c_name BETWEEN 'Customer#000000010' AND 'Customer#000000019' ORDER BY c_name;
