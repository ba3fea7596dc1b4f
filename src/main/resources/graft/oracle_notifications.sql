WITH meta(filename, shop_name, valid_from, valid_to, valid) AS (VALUES
('esomarket_flyer.pdf', 'EsoMarket', DATE '2024-09-01', DATE '2024-09-30', true),
('penny_flyer.pdf', 'Penny', DATE '2024-10-01', DATE '2024-10-31', true),
('billa_flyer.pdf', 'Billa', DATE '2024-10-01', DATE '2024-10-31', false),
('albert_hypermarket_flyer.pdf', 'Albert Hypermarket', DATE '2024-10-10', DATE '2024-10-20', true),
('albert_supermarket_flyer.pdf', 'Albert Supermarket', DATE '2024-10-10', DATE '2024-10-20', false),
('tesco_supermarket_flyer.pdf', 'Tesco Supermarket', DATE '2024-10-01', DATE '2024-10-31', true),
('tesco_hypermarket_flyer.pdf', 'Tesco Hypermarket', DATE '2024-10-16', DATE '2024-11-05', true),
('lidl_flyer.pdf', 'Lidl', DATE '2024-10-10', DATE '2024-10-20', true),
('kaufland_flyer.pdf', 'Kaufland', DATE '2024-09-01', DATE '2024-09-30', true),
('flop_top_flyer.pdf', 'Flop Top', DATE '2024-10-16', DATE '2024-11-05', false),
('flop_flyer.pdf', 'Flop', DATE '2024-09-01', DATE '2024-09-30', true),
('travel_free_flyer.pdf', 'Travel Free', DATE '2024-10-16', DATE '2024-11-05', false),
('cba_potraviny_flyer.pdf', 'CBA Potraviny', DATE '2024-10-10', DATE '2024-10-20', true),
('bene_flyer.pdf', 'Bene', DATE '2024-10-16', DATE '2024-11-05', false),
('cba_premium_flyer.pdf', 'CBA Premium', DATE '2024-09-01', DATE '2024-09-30', true),
('lidl_shop_flyer.pdf', 'Lidl Shop', DATE '2024-09-01', DATE '2024-09-30', false),
('cba_market_flyer.pdf', 'CBA Market', DATE '2024-09-01', DATE '2024-09-30', true),
('makro_flyer.pdf', 'Makro', DATE '2024-09-01', DATE '2024-09-30', true),
('globus_flyer.pdf', 'Globus', DATE '2024-10-10', DATE '2024-10-20', true),
('tamda_foods_flyer.pdf', 'Tamda Foods', DATE '2024-10-16', DATE '2024-11-05', true),
('ratio_flyer.pdf', 'Ratio', DATE '2024-10-10', DATE '2024-10-20', false)),
users(user_id, included, excluded, wants) AS (VALUES
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
  FROM users
  WHERE wants),
by_shop AS (
  SELECT shop_name, user_id
  FROM e
  WHERE NOT list_contains(string_split(excluded, ','), shop_name)),
valid_files AS (
  SELECT shop_name, string_agg(filename, ',' ORDER BY filename) AS files_csv
  FROM meta
  WHERE DATE '2024-10-15' BETWEEN valid_from AND valid_to
  GROUP BY shop_name)
SELECT b.user_id, b.shop_name, v.files_csv
FROM by_shop b
JOIN valid_files v USING (shop_name)
ORDER BY b.user_id, b.shop_name