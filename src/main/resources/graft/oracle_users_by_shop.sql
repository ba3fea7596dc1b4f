WITH users(user_id, included, excluded, wants) AS (VALUES
(1, 'Albert Supermarket,EsoMarket,CBA Potraviny,Globus', 'Kaufland', true),
(2, 'Albert Supermarket,Globus', 'Lidl Shop,Albert Hypermarket', true),
(3, 'Albert Hypermarket,Tesco Supermarket,Lidl', 'Globus,Lidl', false),
(4, 'Flop,EsoMarket,Ratio', '', true),
(5, 'Flop Top,Tesco Supermarket,Travel Free', 'Makro,Lidl Shop', true),
(6, 'Kaufland,Tesco Supermarket,Tamda Foods,Flop Top', 'Kaufland', false),
(7, 'Bene,CBA Premium,Lidl Shop,Lidl', 'Lidl', true),
(8, 'Lidl,Travel Free', 'Tesco Hypermarket,CBA Market', true),
(9, 'Albert Hypermarket,Bene', '', false),
(10, 'Lidl Shop,Tesco Hypermarket,Bene,Travel Free', '', true),
(11, 'Lidl Shop', 'Lidl,CBA Premium', true),
(12, 'Albert Supermarket,EsoMarket,Tamda Foods,Tesco Supermarket,Penny', 'CBA Premium,Albert Supermarket', true),
(13, 'Flop,Albert Hypermarket', '', true),
(14, 'Kaufland,Lidl,Travel Free', '', false),
(15, 'Billa,Albert Supermarket', '', true),
(16, 'CBA Premium', '', true),
(17, 'Makro,Globus', 'CBA Potraviny', true),
(18, 'Kaufland,CBA Market', 'Penny', false),
(19, 'EsoMarket,Lidl Shop', '', true),
(20, 'Flop,Bene', 'Lidl,Ratio', true),
(21, 'CBA Market,Lidl,Tesco Hypermarket', 'Kaufland,Flop Top', true),
(22, 'CBA Premium', 'Albert Supermarket', false),
(23, 'Albert Supermarket', 'Albert Hypermarket,Lidl', true),
(24, 'Globus,Ratio,Lidl Shop', '', true),
(25, 'Penny,Globus,CBA Premium,CBA Market,Tamda Foods', '', true),
(26, 'Flop Top,Kaufland', 'Tesco Hypermarket', true),
(27, 'Kaufland,Bene', 'Albert Hypermarket,Globus', true),
(28, 'Kaufland,Lidl,Travel Free', 'CBA Premium', true),
(29, 'Tesco Supermarket,Billa', 'Kaufland,Globus', false),
(30, 'Globus,Billa,CBA Potraviny', '', true)),
e AS (
  SELECT user_id, unnest(string_split(included, ',')) AS shop_name, excluded
  FROM users)
SELECT shop_name, user_id
FROM e
WHERE NOT list_contains(string_split(excluded, ','), shop_name)
ORDER BY shop_name, user_id