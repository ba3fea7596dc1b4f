WITH users(user_id, included, excluded, wants) AS (VALUES
(CAST(1 AS BIGINT), 'Albert Supermarket,EsoMarket,CBA Potraviny,Globus', 'Kaufland', true),
(CAST(2 AS BIGINT), 'Albert Supermarket,Globus', 'Lidl Shop,Albert Hypermarket', true),
(CAST(3 AS BIGINT), 'Albert Hypermarket,Tesco Supermarket,Lidl', 'Globus,Lidl', false),
(CAST(4 AS BIGINT), 'Flop,EsoMarket,Ratio', '', true),
(CAST(5 AS BIGINT), 'Flop Top,Tesco Supermarket,Travel Free', 'Makro,Lidl Shop', true),
(CAST(6 AS BIGINT), 'Kaufland,Tesco Supermarket,Tamda Foods,Flop Top', 'Kaufland', false),
(CAST(7 AS BIGINT), 'Bene,CBA Premium,Lidl Shop,Lidl', 'Lidl', true),
(CAST(8 AS BIGINT), 'Lidl,Travel Free', 'Tesco Hypermarket,CBA Market', true),
(CAST(9 AS BIGINT), 'Albert Hypermarket,Bene', '', false),
(CAST(10 AS BIGINT), 'Lidl Shop,Tesco Hypermarket,Bene,Travel Free', '', true),
(CAST(11 AS BIGINT), 'Lidl Shop', 'Lidl,CBA Premium', true),
(CAST(12 AS BIGINT), 'Albert Supermarket,EsoMarket,Tamda Foods,Tesco Supermarket,Penny', 'CBA Premium,Albert Supermarket', true),
(CAST(13 AS BIGINT), 'Flop,Albert Hypermarket', '', true),
(CAST(14 AS BIGINT), 'Kaufland,Lidl,Travel Free', '', false),
(CAST(15 AS BIGINT), 'Billa,Albert Supermarket', '', true),
(CAST(16 AS BIGINT), 'CBA Premium', '', true),
(CAST(17 AS BIGINT), 'Makro,Globus', 'CBA Potraviny', true),
(CAST(18 AS BIGINT), 'Kaufland,CBA Market', 'Penny', false),
(CAST(19 AS BIGINT), 'EsoMarket,Lidl Shop', '', true),
(CAST(20 AS BIGINT), 'Flop,Bene', 'Lidl,Ratio', true),
(CAST(21 AS BIGINT), 'CBA Market,Lidl,Tesco Hypermarket', 'Kaufland,Flop Top', true),
(CAST(22 AS BIGINT), 'CBA Premium', 'Albert Supermarket', false),
(CAST(23 AS BIGINT), 'Albert Supermarket', 'Albert Hypermarket,Lidl', true),
(CAST(24 AS BIGINT), 'Globus,Ratio,Lidl Shop', '', true),
(CAST(25 AS BIGINT), 'Penny,Globus,CBA Premium,CBA Market,Tamda Foods', '', true),
(CAST(26 AS BIGINT), 'Flop Top,Kaufland', 'Tesco Hypermarket', true),
(CAST(27 AS BIGINT), 'Kaufland,Bene', 'Albert Hypermarket,Globus', true),
(CAST(28 AS BIGINT), 'Kaufland,Lidl,Travel Free', 'CBA Premium', true),
(CAST(29 AS BIGINT), 'Tesco Supermarket,Billa', 'Kaufland,Globus', false),
(CAST(30 AS BIGINT), 'Globus,Billa,CBA Potraviny', '', true)),
e AS (
  SELECT user_id, unnest(string_split(included, ',')) AS shop_name, excluded
  FROM users)
SELECT shop_name, user_id
FROM e
WHERE NOT list_contains(string_split(excluded, ','), shop_name)
ORDER BY shop_name, user_id