SELECT p.who.city AS city, p.who.geo.zip AS zip FROM (
  SELECT named_struct('who',
    named_struct('city', CONCAT('city_', CAST(r_regionkey AS TEXT)),
                 'geo', named_struct('zip', r_regionkey * 1000))) AS p
  FROM region
) t ORDER BY city;
